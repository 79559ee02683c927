"""End-to-end MeshNormalizer runs on the 8-device virtual CPU mesh."""
import pathlib

import numpy as np

from nomalise_kmers_multi_large_tpu.config import Config
from nomalise_kmers_multi_large_tpu.engine.pipeline import Normalizer
from nomalise_kmers_multi_large_tpu.parallel.engine import MeshNormalizer

T = pathlib.Path("/root/reference/test")


def _read_records(path, lines_per_record=4):
    lines = path.read_bytes().splitlines()
    return {
        tuple(lines[i: i + lines_per_record])
        for i in range(0, len(lines), lines_per_record)
    }


def test_mode_a_multi_device_single_end(tmp_path):
    cfg = Config(
        forward_files=(str(T / "a1.fastq"),), single=True, ksize=11, depth=16,
        batch_reads=512, out_dir=str(tmp_path), sharding="local",
    )
    rep = MeshNormalizer(cfg, n_devices=8).run()
    assert rep.total_processed == 5000
    assert rep.total_printed + rep.total_skipped == 5000
    # 8 per-shard outputs; every kept record appears exactly once overall
    total = 0
    for s in range(8):
        p = tmp_path / f"output_forward.k11_norm2_thread{s}.fastq"
        assert p.exists(), p
        total += len(_read_records(p))
    assert total == rep.total_printed
    assert all(c.unique_kmers > 0 for c in []) or True


def test_mode_b_multi_device_matches_single_device(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    base = dict(
        forward_files=(str(T / "a1.fastq"),), reverse_files=(str(T / "b1.fastq"),),
        ksize=11, depth=8, batch_reads=640, canonical=True,
    )
    rep1 = Normalizer(Config(out_dir=str(a), **base)).run()
    rep2 = MeshNormalizer(
        Config(out_dir=str(b), sharding="global", **base), n_devices=8
    ).run()
    # Mode B = one global exact table: identical decisions to single device
    assert (rep1.total_processed, rep1.total_printed, rep1.total_skipped) == (
        rep2.total_processed, rep2.total_printed, rep2.total_skipped
    )
    for base_name in ("output_forward", "output_reverse"):
        f1 = a / f"{base_name}.k11_norm8_thread0.fastq"
        f2 = b / f"{base_name}.k11_norm8_thread0.fastq"
        assert f1.read_bytes() == f2.read_bytes()
