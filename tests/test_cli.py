"""CLI (`python -m nthash_tpu`) smoke tests."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nthash_tpu.__main__ import main


def test_hash_kmer_golden(capsys):
    assert main(["hash", "-k", "5", "-n", "1", "TGACTGATCGAGTCGTACTAG"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 17
    assert lines[0].split() == ["TGACT", "606f60c2a6fd7d2d"]
    assert lines[16].split()[1] == "80d9e6d93c77ad71"


def test_hash_seeds_golden(capsys):
    assert main(["hash", "-k", "5", "-s", "10101", "-s", "11011", "-n", "3",
                 "TGACTGATCGAGTCGTACTAG"]) == 0
    first = capsys.readouterr().out.splitlines()[0].split()
    assert first[1] == "9f8f9fbf890d6351"
    assert first[4] == "7539d859409e5b0a"


def test_hash_bad_k(capsys):
    assert main(["hash", "-k", "0", "ACGT"]) == 1
    assert "k must be greater than 0" in capsys.readouterr().err


def test_count(tmp_path, capsys):
    fa = tmp_path / "toy.fa"
    fa.write_text(">r1\nACGTACGTACGTACGT\n>r2\nACGTNNACGTACGTAC\n")
    assert main(["count", str(fa), "-k", "4", "--batch-size", "8"]) == 0
    out = capsys.readouterr().out
    # r1: 13 windows; r2: 13 windows - 5 overlapping the NN island = 8
    assert out.startswith("21 valid 4-mers")


def test_count_missing_file(capsys):
    assert main(["count", "/nonexistent.fa"]) == 1


def test_count_fused(tmp_path, capsys):
    fa = tmp_path / "toy.fa"
    fa.write_text(">r1\nACGTACGTACGTACGT\n>r2\nACGTNNACGTACGTAC\n")
    assert main(["count", str(fa), "-k", "4", "--batch-size", "8",
                 "--width-log2", "12", "--fused"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("2 reads, 21 valid 4-mers")
