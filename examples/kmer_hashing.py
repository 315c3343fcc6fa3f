#!/usr/bin/env python
"""k-mer hashing walk (parity with reference examples/kmer_hashing.cpp:1-20):
roll a 25-bp sequence at k=9, printing each k-mer and its 3 hash values."""

from nthash_tpu import NtHash

SEQ = "AGCTACGATCAGCATCGATCAGCAT"
K = 9

nth = NtHash(SEQ, 3, K)
while nth.roll():
    p = nth.get_pos()
    print(SEQ[p : p + K], *(hex(h) for h in nth.hashes()))
