"""Conformance runner + fuzz harness smoke tests
(tools/conformance/conformance.py and tools/*_fuzzer.cc analogs)."""

import json
import os

import numpy as np

from libjxl_tpu.tools import conformance, fuzz


def test_conformance_generate_and_check(tmp_path):
    rng = np.random.default_rng(0)
    img = np.clip(rng.normal(128, 40, (48, 56, 3)), 0, 255).astype(np.uint8)
    case = tmp_path / "case1"
    conformance.generate_case(img, str(case), distance=1.0)
    assert conformance.check_case(str(case)) == []
    # a corrupted reference must fail the bounds
    ref = np.load(case / "ref.npy")
    ref[..., 0] += 0.1
    np.save(case / "ref.npy", ref)
    assert conformance.check_case(str(case))


def test_conformance_lossless_bitexact(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    case = tmp_path / "ll"
    conformance.generate_case(img, str(case), lossless=True)
    spec = json.loads((case / "test.json").read_text())
    assert spec["rmse_limit"] <= 1e-6
    assert conformance.check_case(str(case)) == []


def test_fuzz_targets_no_findings():
    """Bounded fuzz pass over every decoder surface: any non-JXLError
    exception is a bug."""
    for target in fuzz.TARGETS:
        assert fuzz.run(target, iters=25, seed=1234) == 0, target


def test_skip_bits_large_is_fast():
    """skip_bits must be O(1) — a forged extension size of ~2^60 bits
    previously hung the header parser (found by the fields fuzzer)."""
    import time

    from libjxl_tpu.io.bits import BitReader

    r = BitReader(b"\x00" * 16)
    t0 = time.time()
    r.skip_bits(1 << 60)
    assert time.time() - t0 < 0.1
    assert not r.all_reads_within_bounds()
