#!/usr/bin/env python
"""Streaming k-mer counting: FASTA/FASTQ file -> distributed hash+sketch.

The flagship deployment: reads stream through the native parser, shard
data-parallel over all visible devices, every valid k-mer updates a
count-min sketch merged with one psum. Usage:

    python examples/streaming_count.py reads.fq [k] [parse_threads]

With parse_threads > 1 the file parses as byte-range shards in parallel
(each worker resyncs to a record boundary; the sketch is order-invariant,
so the result is bit-identical to the serial parse).
"""

import sys

from nthash_tpu.models.pipeline import PipelineConfig, ReadHashingPipeline
from nthash_tpu.utils import metrics

path = sys.argv[1]
k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 1

metrics.configure_logging()
pipe = ReadHashingPipeline(PipelineConfig(k=k, num_hashes=4))
total = pipe.run_file(path, threads=threads)
print(f"hashed {total} valid {k}-mers from {path} "
      f"across {pipe.mesh.devices.size} device(s) "
      f"({threads} parse thread(s))")
