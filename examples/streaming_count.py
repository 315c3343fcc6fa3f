#!/usr/bin/env python
"""Streaming k-mer counting: FASTA/FASTQ file -> distributed hash+sketch.

The flagship deployment: reads stream through the native parser, shard
data-parallel over all visible devices, every valid k-mer updates a
count-min sketch merged with one psum. Usage:

    python examples/streaming_count.py reads.fq [k]
"""

import sys

from nthash_tpu.models.pipeline import PipelineConfig, ReadHashingPipeline
from nthash_tpu.utils import metrics

path = sys.argv[1]
k = int(sys.argv[2]) if len(sys.argv) > 2 else 32

metrics.configure_logging()
pipe = ReadHashingPipeline(PipelineConfig(k=k, num_hashes=4))
total = pipe.run_file(path)
print(f"hashed {total} valid {k}-mers from {path} "
      f"across {pipe.mesh.devices.size} device(s)")
