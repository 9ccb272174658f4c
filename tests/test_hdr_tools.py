"""HDR CLI tools (tools/hdr/ analogs)."""

import numpy as np

from libjxl_tpu.extras.io import load_image, save_image
from libjxl_tpu.render.tone_map import pq_eotf, pq_inv_eotf
from libjxl_tpu.tools.hdr import main as hdr


def _pq_image(tmp_path, peak=4000.0):
    yy, xx = np.mgrid[0:32, 0:40]
    nits = 10 + peak * (np.sin(xx / 9.0) * 0.5 + 0.5)[..., None] \
        * np.array([1.0, 0.8, 0.6])
    p = tmp_path / "pq.pfm"
    save_image(p, pq_inv_eotf(nits).astype(np.float32))
    return p, nits


def test_tone_map_compresses_peak(tmp_path):
    src, nits = _pq_image(tmp_path)
    out = tmp_path / "tm.pfm"
    assert hdr(["tone_map", str(src), str(out),
                "--source_nits", "4010", "--target_nits", "300"]) == 0
    mapped = pq_eotf(np.moveaxis(load_image(out), -1, 0))
    assert mapped.max() < 450  # peak compressed toward 300
    # darks pass through nearly unchanged (knee only bends highlights)
    assert abs(mapped.min() - nits.min()) / nits.min() < 0.1


def test_pq_hlg_roundtrip(tmp_path):
    src, nits = _pq_image(tmp_path, peak=900.0)  # inside 1000-nit range
    hlg = tmp_path / "h.pfm"
    back = tmp_path / "pq2.pfm"
    assert hdr(["pq_to_hlg", str(src), str(hlg),
                "--max_nits", "1000"]) == 0
    assert hdr(["hlg_to_pq", str(hlg), str(back)]) == 0
    sig = load_image(hlg)
    assert 0.0 <= sig.min() and sig.max() <= 1.0
    n2 = pq_eotf(np.moveaxis(load_image(back), -1, 0))
    # OOTF(OOTF^-1) roundtrip: luminance order preserved, peak similar
    assert n2.max() < 1200
    corr = np.corrcoef(np.moveaxis(nits, -1, 0).ravel(), n2.ravel())[0, 1]
    assert corr > 0.98


def test_render_hlg_writes_sdr(tmp_path):
    src, _ = _pq_image(tmp_path, peak=900.0)
    hlg = tmp_path / "h.pfm"
    sdr = tmp_path / "sdr.png"
    assert hdr(["pq_to_hlg", str(src), str(hlg)]) == 0
    assert hdr(["render_hlg", str(hlg), str(sdr),
                "--max_nits", "600"]) == 0
    img = load_image(sdr)
    assert img.dtype == np.uint8
    assert img.min() < 100 and img.max() > 150  # real dynamic range
