"""Native C++ FASTX parser/encoder vs the numpy loader (same semantics)."""

import numpy as np
import pytest

from nthash_tpu.constants import encode_ascii
from nthash_tpu.io import native_loader
from nthash_tpu.io.fasta import encode_batch, read_fastx

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="no C++ toolchain"
)


def test_native_encode_matches_python():
    seq = b"ACGTacgtUuNnXx \t@>123" * 7
    assert np.array_equal(native_loader.encode(seq), encode_ascii(seq))


def _write_fasta(path, reads):
    with open(path, "wb") as fh:
        for i, r in enumerate(reads):
            fh.write(b">r%d desc\n" % i)
            # split across lines to exercise multi-line records
            for j in range(0, len(r), 10):
                fh.write(r[j : j + 10] + b"\n")


def _write_fastq(path, reads):
    with open(path, "wb") as fh:
        for i, r in enumerate(reads):
            fh.write(b"@r%d\n" % i + r + b"\n+\n" + b"I" * len(r) + b"\n")


@pytest.mark.parametrize("writer", [_write_fasta, _write_fastq])
def test_native_parser_matches_numpy(tmp_path, rng, writer):
    reads = [
        bytes(rng.choice(list(b"ACGTN"), size=int(n)))
        for n in rng.integers(5, 40, size=57)
    ]
    p = tmp_path / "x.fastx"
    writer(p, reads)

    expect_all = encode_batch(reads, length=30)
    with native_loader.NativeFastxParser(p) as parser:
        got, lengths = [], []
        for codes, lens in parser.batches(16, 30):
            got.append(codes)
            lengths.extend(lens)
    got = np.concatenate(got)
    assert got.shape == expect_all.shape
    assert np.array_equal(got, expect_all)
    assert lengths == [len(r) for r in reads]


def test_native_parser_vs_python_reader(tmp_path):
    p = tmp_path / "mix.fa"
    p.write_bytes(b">a\nACGT\nACGT\n\n>b\nNNNN\n>c\nacgtu\n")
    py = [(n, s) for n, s in read_fastx(p)]
    with native_loader.NativeFastxParser(p) as parser:
        codes, lens = parser.next_batch(10, 12)
    assert len(py) == codes.shape[0] == 3
    for i, (_, seq) in enumerate(py):
        assert lens[i] == len(seq)
        assert np.array_equal(codes[i, : len(seq)], encode_ascii(seq))
        assert (codes[i, len(seq) :] == 4).all()


def test_native_parser_malformed(tmp_path):
    p = tmp_path / "bad.fq"
    p.write_bytes(b"@r1\nACGT\nNOPLUS\nIIII\n")
    with native_loader.NativeFastxParser(p) as parser:
        with pytest.raises(ValueError, match="missing"):
            parser.next_batch(4, 10)


def test_native_parser_missing_file():
    with pytest.raises(FileNotFoundError):
        native_loader.NativeFastxParser("/nonexistent/xx.fa")


@pytest.mark.skipif(not native_loader.available(), reason="no toolchain")
def test_byte_range_shards_partition_records(tmp_path, rng):
    """Fuzz the byte-range resync: for random variable-length FASTQ (with
    adversarial '@'-leading quality lines) and multi-line FASTA, any shard
    count must partition the records exactly — no loss, no duplication."""
    import numpy as np

    from nthash_tpu.io.native_loader import NativeFastxParser, sniff_format

    CODE = {65: 0, 67: 1, 71: 2, 84: 3, 78: 4}
    bases = np.frombuffer(b"ACGTN", np.uint8)

    def mk_fastq(path, n):
        # i % 5 == 1: empty-sequence records — combined with '@'-leading
        # quality on the previous record (i % 3 == 0, so both align every
        # 15 records) this is the exact resync false-positive of ADVICE r4
        # medium: quality '@...' -> header -> empty seq -> '+' used to
        # validate the quality line as a header under blank-line skipping
        seqs = []
        with open(path, "wb") as f:
            for i in range(n):
                ln = 0 if i % 5 == 1 else int(rng.integers(5, 30))
                seq = bases[rng.integers(0, 5, size=ln)].tobytes()
                qual = (b"@" if i % 3 == 0 else b"I") * ln
                f.write(b"@read%d\n" % i + seq + b"\n+\n" + qual + b"\n")
                seqs.append(seq)
        return seqs

    def mk_fasta(path, n):
        seqs = []
        with open(path, "wb") as f:
            for i in range(n):
                ln = int(rng.integers(5, 60))
                seq = bases[rng.integers(0, 5, size=ln)].tobytes()
                f.write(b">r%d\n" % i)
                for j in range(0, ln, 17):
                    f.write(seq[j : j + 17] + b"\n")
                seqs.append(seq)
        return seqs

    for mk, name in ((mk_fastq, "t.fq"), (mk_fasta, "t.fa")):
        path = tmp_path / name
        seqs = mk(path, 300)
        fmt = sniff_format(path)
        size = path.stat().st_size
        rl = 64
        exp = np.full((300, rl), 4, np.uint8)
        for i, s in enumerate(seqs):
            arr = [CODE[c] for c in s[:rl]]
            exp[i, : len(arr)] = arr

        def collect(start, end):
            rows = []
            with NativeFastxParser(path, start, end, fmt) as p:
                while True:
                    b = p.next_batch(64, rl)
                    if b is None:
                        break
                    rows.append(b[0])
            return (np.concatenate(rows) if rows
                    else np.zeros((0, rl), np.uint8))

        for nshards in (1, 2, 5, 11):
            bounds = [size * i // nshards for i in range(nshards + 1)]
            got = np.concatenate(
                [collect(bounds[i], bounds[i + 1]) for i in range(nshards)])
            assert got.shape[0] == 300, (name, nshards, got.shape)
            assert np.array_equal(got, exp), (name, nshards)
