"""Host parallel runners (JxlParallelRunner / ThreadParallelRunner /
FakeParallelRunner analogs)."""

import numpy as np

from libjxl_tpu.api.codestream import decode, encode_lossy
from libjxl_tpu.parallel.runner import (
    FakeParallelRunner,
    SequentialRunner,
    ThreadParallelRunner,
)


def smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for i in range(3):
        img[:, :, i] = 128 + 80 * np.sin(xx / 17 + i) * np.cos(yy / 23 - i)
    img += rng.normal(0, 3, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_runners_run_all_tasks():
    for runner in (SequentialRunner(), ThreadParallelRunner(4),
                   FakeParallelRunner(7)):
        hit = [0] * 16
        def mk(i):
            def t():
                hit[i] += 1
            return t
        runner.run([mk(i) for i in range(16)])
        assert hit == [1] * 16


def test_threaded_decode_matches_sequential():
    img = smooth(530, 300)  # multiple AC groups
    data = encode_lossy(img, distance=1.0)
    seq, _ = decode(data)
    par, _ = decode(data, num_threads=4)
    np.testing.assert_array_equal(seq, par)


def test_fake_runner_order_independence():
    """Shuffled section execution must give identical output
    (FakeParallelRunner semantics, fake_parallel_runner_testonly.h)."""
    from libjxl_tpu.io.bits import BitReader
    from libjxl_tpu.api.codestream import parse_codestream_header
    from libjxl_tpu.io.frame_header import FrameHeader
    from libjxl_tpu.vardct.frame import decode_vardct_frame

    img = smooth(530, 300, seed=3)
    data = encode_lossy(img, distance=1.0)

    def dec(runner):
        r = BitReader(data)
        meta = parse_codestream_header(r)
        fh = FrameHeader(meta)
        fh.read(r)
        chans = decode_vardct_frame(r, fh, runner=runner)
        return np.stack(chans)

    ref = dec(None)
    for seed in (1, 2, 3):
        np.testing.assert_array_equal(ref, dec(FakeParallelRunner(seed)))
