"""nthash_tpu: TPU-native k-mer hashing framework (ntHash2-compatible)."""

from .constants import NTHASH_FN_NAME
from .u64 import U64

__version__ = "0.1.0"
