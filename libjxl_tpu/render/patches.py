"""Patch dictionary: rectangles blitted from saved reference frames.

Codec + blitter for the kPatches image feature. Mirrors
dec_patch_dictionary.cc:29-176 (Decode), enc_patch_dictionary.cc
(TokenizePatch ordering), and the blend-mode semantics of
dec_patch_dictionary.h:35-69 / blending.cc.

Context numbers per spec C.4.5 Listing C.2 (patch_dictionary_internal.h).
The reference encoder finds patches with a text-like detector
(FindTextLikePatches); this framework takes patches as explicit encoder
inputs and focuses on exact codec + rendering parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..base.status import JXLError
from ..io.bits import BitReader, BitWriter
from ..io.fields import pack_signed, unpack_signed

CTX_NUM_REF_PATCH = 0
CTX_REFERENCE_FRAME = 1
CTX_PATCH_SIZE = 2
CTX_PATCH_REFERENCE_POSITION = 3
CTX_PATCH_POSITION = 4
CTX_PATCH_BLEND_MODE = 5
CTX_PATCH_OFFSET = 6
CTX_PATCH_COUNT = 7
CTX_PATCH_ALPHA_CHANNEL = 8
CTX_PATCH_CLAMP = 9
NUM_PATCH_CONTEXTS = 10

# PatchBlendMode (dec_patch_dictionary.h:35-69)
BLEND_NONE = 0
BLEND_REPLACE = 1
BLEND_ADD = 2
BLEND_MUL = 3
BLEND_BLEND_ABOVE = 4
BLEND_BLEND_BELOW = 5
BLEND_ALPHA_WEIGHTED_ADD_ABOVE = 6
BLEND_ALPHA_WEIGHTED_ADD_BELOW = 7
NUM_BLEND_MODES = 8

MAX_NUM_REFERENCE_FRAMES = 4


def uses_alpha(mode: int) -> bool:
    return mode in (BLEND_BLEND_ABOVE, BLEND_BLEND_BELOW,
                    BLEND_ALPHA_WEIGHTED_ADD_ABOVE,
                    BLEND_ALPHA_WEIGHTED_ADD_BELOW)


def uses_clamp(mode: int) -> bool:
    return uses_alpha(mode) or mode == BLEND_MUL


@dataclass
class PatchReferencePosition:
    ref: int
    x0: int
    y0: int
    xsize: int
    ysize: int


@dataclass
class PatchPosition:
    x: int
    y: int
    ref_pos_idx: int


@dataclass
class PatchBlending:
    mode: int = BLEND_NONE
    alpha_channel: int = 0
    clamp: bool = False


@dataclass
class PatchesState:
    ref_positions: list = field(default_factory=list)
    positions: list = field(default_factory=list)
    blendings: list = field(default_factory=list)  # [patch][channel-group]
    blendings_stride: int = 1


def decode_patches(r: BitReader, xsize: int, ysize: int,
                   num_extra_channels: int,
                   reference_frames) -> PatchesState:
    """PatchDictionary::Decode (dec_patch_dictionary.cc:29-176).

    reference_frames: list of (3, H, W) arrays or None per slot."""
    from ..entropy.decode import ANSSymbolReader, decode_histograms

    st = PatchesState()
    st.blendings_stride = num_extra_channels + 1
    code, cmap = decode_histograms(r, NUM_PATCH_CONTEXTS)
    reader = ANSSymbolReader(code, r)

    def read_num(ctx):
        return reader.read_hybrid_uint(ctx, r, cmap)

    num_ref_patch = read_num(CTX_NUM_REF_PATCH)
    num_pixels = xsize * ysize
    max_ref_patches = 1024 + num_pixels // 4
    max_patches = max_ref_patches * 4
    if num_ref_patch > max_ref_patches:
        raise JXLError("too many patches in dictionary")
    total_patches = 0
    for _ in range(num_ref_patch):
        ref = read_num(CTX_REFERENCE_FRAME)
        if ref >= MAX_NUM_REFERENCE_FRAMES or reference_frames is None \
                or ref >= len(reference_frames) \
                or reference_frames[ref] is None:
            raise JXLError("invalid reference frame ID in patches")
        ref_img = reference_frames[ref]
        x0 = read_num(CTX_PATCH_REFERENCE_POSITION)
        y0 = read_num(CTX_PATCH_REFERENCE_POSITION)
        w = read_num(CTX_PATCH_SIZE) + 1
        h = read_num(CTX_PATCH_SIZE) + 1
        if x0 + w > ref_img.shape[-1] or y0 + h > ref_img.shape[-2]:
            raise JXLError("invalid position in reference frame")
        ref_pos = PatchReferencePosition(ref, x0, y0, w, h)
        id_count = read_num(CTX_PATCH_COUNT) + 1
        total_patches += id_count
        if total_patches > max_patches:
            raise JXLError("too many patches in dictionary")
        choose_alpha = num_extra_channels > 1
        for i in range(id_count):
            if i == 0:
                x = read_num(CTX_PATCH_POSITION)
                y = read_num(CTX_PATCH_POSITION)
            else:
                dx = unpack_signed(read_num(CTX_PATCH_OFFSET))
                dy = unpack_signed(read_num(CTX_PATCH_OFFSET))
                x = st.positions[-1].x + dx
                y = st.positions[-1].y + dy
                if x < 0 or y < 0:
                    raise JXLError("invalid patch: negative coordinate")
            if x + w > xsize or y + h > ysize:
                raise JXLError("invalid patch position")
            blend = []
            for _j in range(st.blendings_stride):
                mode = read_num(CTX_PATCH_BLEND_MODE)
                if mode >= NUM_BLEND_MODES:
                    raise JXLError("invalid patch blend mode")
                info = PatchBlending(mode)
                if uses_alpha(mode) and choose_alpha:
                    info.alpha_channel = read_num(CTX_PATCH_ALPHA_CHANNEL)
                    if info.alpha_channel >= num_extra_channels:
                        raise JXLError("invalid alpha channel for blending")
                if uses_clamp(mode):
                    info.clamp = bool(read_num(CTX_PATCH_CLAMP))
                blend.append(info)
            st.positions.append(
                PatchPosition(x, y, len(st.ref_positions)))
            st.blendings.append(blend)
        st.ref_positions.append(ref_pos)
    if not reader.check_final_state():
        raise JXLError("patches ANS final state mismatch")
    return st


def encode_patches(st: PatchesState, w: BitWriter) -> None:
    """PatchDictionaryEncoder::Encode (enc_patch_dictionary.cc)."""
    from ..entropy.encode import Token, build_and_encode_histograms, \
        write_tokens

    tokens = [Token(CTX_NUM_REF_PATCH, len(st.ref_positions))]
    # group positions by ref_pos_idx, preserving order
    by_ref = [[] for _ in st.ref_positions]
    for idx, pos in enumerate(st.positions):
        by_ref[pos.ref_pos_idx].append(idx)
    for rp_idx, rp in enumerate(st.ref_positions):
        tokens.append(Token(CTX_REFERENCE_FRAME, rp.ref))
        tokens.append(Token(CTX_PATCH_REFERENCE_POSITION, rp.x0))
        tokens.append(Token(CTX_PATCH_REFERENCE_POSITION, rp.y0))
        tokens.append(Token(CTX_PATCH_SIZE, rp.xsize - 1))
        tokens.append(Token(CTX_PATCH_SIZE, rp.ysize - 1))
        idxs = by_ref[rp_idx]
        tokens.append(Token(CTX_PATCH_COUNT, len(idxs) - 1))
        for i, idx in enumerate(idxs):
            pos = st.positions[idx]
            if i == 0:
                tokens.append(Token(CTX_PATCH_POSITION, pos.x))
                tokens.append(Token(CTX_PATCH_POSITION, pos.y))
            else:
                prev = st.positions[idxs[i - 1]]
                tokens.append(Token(CTX_PATCH_OFFSET,
                                    pack_signed(pos.x - prev.x)))
                tokens.append(Token(CTX_PATCH_OFFSET,
                                    pack_signed(pos.y - prev.y)))
            for info in st.blendings[idx]:
                tokens.append(Token(CTX_PATCH_BLEND_MODE, info.mode))
                if uses_alpha(info.mode) and st.blendings_stride > 2:
                    tokens.append(Token(CTX_PATCH_ALPHA_CHANNEL,
                                        info.alpha_channel))
                if uses_clamp(info.mode):
                    tokens.append(Token(CTX_PATCH_CLAMP, int(info.clamp)))
    codes, cmap = build_and_encode_histograms(
        [tokens], NUM_PATCH_CONTEXTS, w)
    write_tokens(tokens, codes, cmap, w)


def apply_patches(img: np.ndarray, st: PatchesState, reference_frames,
                  add: bool = True, extra=None, ref_extra=None,
                  alpha_is_premultiplied: bool = False) -> None:
    """Blit all patches into img (3, H, W) in place (AddOneRow analog,
    vectorized over whole patch rectangles).

    Color blend modes kNone/kReplace/kAdd/kMul and the alpha-dependent
    kBlendAbove/Below + kAlphaWeightedAddAbove/Below
    (PerformAlphaBlending / PerformAlphaWeightedAdd, blending.cc:21-119).
    extra: list of (H, W) float planes — the frame's extra channels,
    blended in place per blend[1+k]. ref_extra: per reference slot, list
    of extra-channel planes of that reference frame (alpha source).
    Alpha planes are in [0, 1] units."""
    for pos, blend in zip(st.positions, st.blendings):
        rp = st.ref_positions[pos.ref_pos_idx]
        fg = reference_frames[rp.ref][:, rp.y0:rp.y0 + rp.ysize,
                                      rp.x0:rp.x0 + rp.xsize]
        sl = (slice(None), slice(pos.y, pos.y + rp.ysize),
              slice(pos.x, pos.x + rp.xsize))
        sl2 = (sl[1], sl[2])
        rsl2 = (slice(rp.y0, rp.y0 + rp.ysize), slice(rp.x0, rp.x0 + rp.xsize))

        def fg_alpha(info):
            planes = ref_extra[rp.ref] if ref_extra else None
            if planes is None or info.alpha_channel >= len(planes):
                raise JXLError("alpha-blend patch without alpha channel")
            a = planes[info.alpha_channel][rsl2]
            return np.clip(a, 0.0, 1.0) if info.clamp else a

        mode = blend[0].mode
        if mode == BLEND_REPLACE:
            if add:
                img[sl] = fg
            else:
                img[sl] = 0.0
        elif mode == BLEND_ADD:
            if add:
                img[sl] += fg
            else:
                img[sl] -= fg
        elif mode == BLEND_MUL:
            f = np.clip(fg, 0.0, 1.0) if blend[0].clamp else fg
            if add:
                img[sl] *= f
            else:
                safe = np.where(f == 0.0, 1.0, f)
                img[sl] /= safe
        elif mode in (BLEND_BLEND_ABOVE, BLEND_BLEND_BELOW):
            if not add:
                # encoder semantics: the input image IS the background;
                # alpha-blend patches are composited only at decode time
                continue
            fa = fg_alpha(blend[0])
            bg = img[sl]
            if extra is None or blend[0].alpha_channel >= len(extra):
                raise JXLError("alpha-blend patch without frame alpha")
            ba_full = extra[blend[0].alpha_channel]
            ba = ba_full[sl2]
            if alpha_is_premultiplied:
                # premultiplied (blending.cc:33-48)
                if mode == BLEND_BLEND_ABOVE:
                    img[sl] = fg + bg * (1.0 - fa)[None]
                    ba_full[sl2] = fa + ba * (1.0 - fa)
                else:
                    img[sl] = bg + fg * (1.0 - ba)[None]
                    ba_full[sl2] = ba + fa * (1.0 - ba)
            else:
                # non-premultiplied (blending.cc:50-76)
                if mode == BLEND_BLEND_ABOVE:
                    new_a = fa + ba * (1.0 - fa)
                    safe = np.where(new_a == 0.0, 1.0, new_a)
                    img[sl] = (fg * fa[None]
                               + bg * (ba * (1.0 - fa))[None]) / safe[None]
                else:
                    new_a = ba + fa * (1.0 - ba)
                    safe = np.where(new_a == 0.0, 1.0, new_a)
                    img[sl] = (bg * ba[None]
                               + fg * (fa * (1.0 - ba))[None]) / safe[None]
                ba_full[sl2] = new_a
        elif mode in (BLEND_ALPHA_WEIGHTED_ADD_ABOVE,
                      BLEND_ALPHA_WEIGHTED_ADD_BELOW):
            fa = fg_alpha(blend[0])
            if mode == BLEND_ALPHA_WEIGHTED_ADD_BELOW:
                if extra is None or blend[0].alpha_channel >= len(extra):
                    raise JXLError("alpha-weighted-add needs frame alpha")
                fa = extra[blend[0].alpha_channel][sl2]
            if add:
                img[sl] += fg * fa[None]
            else:
                img[sl] -= fg * fa[None]
        # extra-channel blending per channel group (blend[1 + k])
        if extra is not None and len(blend) > 1:
            for k, info in enumerate(blend[1:]):
                if k >= len(extra) or info.mode in (BLEND_NONE,
                                                    BLEND_BLEND_ABOVE,
                                                    BLEND_BLEND_BELOW):
                    continue  # blend modes handled with color above
                planes = ref_extra[rp.ref] if ref_extra else None
                if planes is None or k >= len(planes):
                    continue
                fg_e = planes[k][rsl2]
                if info.mode == BLEND_REPLACE:
                    extra[k][sl2] = fg_e if add else 0.0
                elif info.mode == BLEND_ADD:
                    extra[k][sl2] += fg_e if add else -fg_e
                elif info.mode == BLEND_MUL:
                    f = np.clip(fg_e, 0.0, 1.0) if info.clamp else fg_e
                    if add:
                        extra[k][sl2] *= f
                    else:
                        extra[k][sl2] /= np.where(f == 0.0, 1.0, f)


DOT_SIZE = 5  # extracted dot patch side (enc_detect_dots kEllipseWindow)


def find_dots(xyb: np.ndarray, max_dots: int = 256,
              energy_thresh: float = 0.04):
    """Detect small isolated high-energy spots ("dots") that VarDCT codes
    poorly and extract them as additive patches
    (DetectGaussianEllipses / FindBestPatchDictionary dot path,
    enc_detect_dots.cc + enc_dot_dictionary.cc, simplified: extraction
    without Gaussian refitting).

    xyb: (3, H, W). Returns (sheet (3, 5, 5*n) XYB residuals,
    placements [(sx, 0, 5, 5, [(x, y)])...]) or None."""
    _, h, w = xyb.shape
    if h < 16 or w < 16:
        return None
    # smooth background: separable 5-tap blur
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    k /= k.sum()
    sm = xyb
    for axis in (-2, -1):
        sm = np.apply_along_axis(
            lambda r: np.convolve(np.pad(r, 2, mode="edge"), k, "valid"),
            axis, sm)
    res = xyb - sm
    weights = np.array([60.0, 4.0, 2.0])[:, None, None]
    energy = ((res * weights) ** 2).sum(axis=0)
    # local maxima over a 5x5 window
    p = np.pad(energy, 2, mode="constant")
    is_max = np.ones_like(energy, dtype=bool)
    for dy in range(5):
        for dx in range(5):
            if dy == 2 and dx == 2:
                continue
            is_max &= energy >= p[dy:dy + h, dx:dx + w]
    half = DOT_SIZE // 2
    cand = np.flatnonzero((is_max & (energy > energy_thresh))[
        half:h - half, half:w - half].reshape(-1))
    if len(cand) == 0:
        return None
    ys, xs = np.unravel_index(cand, (h - 2 * half, w - 2 * half))
    ys = ys + half
    xs = xs + half
    order = np.argsort(-energy[ys, xs])
    picked = []
    for i in order:
        y, x = int(ys[i]), int(xs[i])
        if any(abs(y - py) < DOT_SIZE and abs(x - px) < DOT_SIZE
               for py, px in picked):
            continue
        # isolation: the 9x9 ring outside the 5x5 blob must be quiet
        y0, y1 = max(0, y - 4), min(h, y + 5)
        ring = energy[y0:y1, max(0, x - 4):min(w, x + 5)].sum() \
            - energy[y - half:y + half + 1, x - half:x + half + 1].sum()
        blob = energy[y - half:y + half + 1, x - half:x + half + 1].sum()
        if ring > 0.35 * blob:
            continue
        picked.append((y, x))
        if len(picked) >= max_dots:
            break
    if not picked:
        return None
    sheet = np.zeros((3, DOT_SIZE, DOT_SIZE * len(picked)))
    placements = []
    for i, (y, x) in enumerate(picked):
        # dot content = region minus the surrounding ring's mean, so the
        # FULL spot lands in the patch and the background stays smooth
        y0, y1 = max(0, y - 4), min(h, y + 5)
        x0, x1 = max(0, x - 4), min(w, x + 5)
        region9 = xyb[:, y0:y1, x0:x1]
        blob5 = xyb[:, y - half:y + half + 1, x - half:x + half + 1]
        ring_sum = region9.sum(axis=(1, 2)) - blob5.sum(axis=(1, 2))
        ring_n = region9.shape[1] * region9.shape[2] - DOT_SIZE * DOT_SIZE
        bg = ring_sum / max(ring_n, 1)
        sheet[:, :, i * DOT_SIZE:(i + 1) * DOT_SIZE] = \
            blob5 - bg[:, None, None]
        placements.append((i * DOT_SIZE, 0, DOT_SIZE, DOT_SIZE,
                           [(x - half, y - half)]))
    return sheet, placements


def get_references(st: PatchesState) -> int:
    mask = 0
    for rp in st.ref_positions:
        mask |= 1 << rp.ref
    return mask
