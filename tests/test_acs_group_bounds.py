"""A transform may not cross an AC-group boundary (dec_modular.cc:515
"Invalid AC strategy" checks): crafted metadata placing one must be
rejected, not written past the per-group scratch (OOB guard)."""

import numpy as np
import pytest

from libjxl_tpu import native_ext
from libjxl_tpu.vardct import ac_strategy as acs


def _place(x0, strategy_id, gdim=32, nbx=64, nby=32):
    lib = native_ext.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    rw, rh = nbx, nby
    strategy = np.full((nby, nbx), -1, dtype=np.int32)
    origin = np.zeros((nby, nbx), dtype=np.bool_)
    qf = np.zeros((nby, nbx), dtype=np.int32)
    sharp_out = np.zeros((nby, nbx), dtype=np.int32)
    sharp = np.zeros((rh, rw), dtype=np.int32)
    # first block placed at (0, x0) gets `strategy_id`; pad the count so
    # the remaining blocks can be DCT8
    acs_row = np.zeros(rw * rh, dtype=np.int32)
    acs_row[0] = strategy_id
    qf_row = np.ones(rw * rh, dtype=np.int32)
    # shift the placement to x0 by pre-marking columns < x0 as occupied
    if x0:
        strategy[:, :x0] = acs.DCT
    return native_ext.place_ac_metadata_native(
        lib, acs_row, qf_row, rw * rh, sharp, 0, 0, rw, rh,
        nbx, nby, gdim, 255, strategy, origin, qf, sharp_out)


def test_group_crossing_block_rejected():
    s32 = next(s for s in range(acs.NUM_STRATEGIES)
               if acs.COVERED_X[s] == 4 and acs.COVERED_Y[s] == 4)
    # origin at block x=30 with a 4-block-wide transform crosses the
    # 32-block group boundary -> corrupt stream
    assert _place(30, s32) == -1


def test_group_aligned_block_accepted():
    s32 = next(s for s in range(acs.NUM_STRATEGIES)
               if acs.COVERED_X[s] == 4 and acs.COVERED_Y[s] == 4)
    assert _place(28, s32) > 0
