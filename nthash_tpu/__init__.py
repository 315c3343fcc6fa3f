"""nthash_tpu: TPU-native k-mer hashing framework (ntHash2-compatible).

Public API parity with the reference (include/nthash/nthash.hpp:34-60):
the four iterator classes + parse_seeds + NTHASH_FN_NAME live at top level.
The batched device engines are under ops/, scale-out under parallel/,
streaming IO under io/, downstream models under models/.
"""

from .api import (
    BlindNtHash,
    BlindSeedNtHash,
    NtHash,
    SeedNtHash,
    parse_seeds,
)
from . import typedefs
from .constants import NTHASH_FN_NAME
from .u64 import U64

__version__ = "0.1.0"

__all__ = [
    "NtHash",
    "BlindNtHash",
    "SeedNtHash",
    "BlindSeedNtHash",
    "parse_seeds",
    "NTHASH_FN_NAME",
    "U64",
    "typedefs",
]
