"""Pure-stdlib GIF codec (GIF87a/89a, single-image AND animated).

Third REAL bytes->pixels decode path in this container, covering the two
failure classes the other codecs don't reach: LZW entropy coding with
growing code widths (PNG uses zlib's deflate via the stdlib; BMP has no
entropy coding) and PALETTE INDIRECTION (both other codecs store
samples directly; GIF stores indices into a color table, global or
local, so a palette mix-up permutes colors without changing a single
index). Interlaced images add a third layout rule (the 8/8/4/2 row
pass ordering).

The format is public (GIF89a specification, CompuServe 1990): 6-byte
signature, logical screen descriptor, optional global color table, then
a block stream: extensions, image descriptors (each with an optional
local color table and an LZW-compressed index stream in length-prefixed
sub-blocks), trailer. decode_gif reads single-image files; animations
(many image descriptors, graphic-control extensions for transparency /
disposal) go through decode_gif_frames, which composites each frame
rect onto the logical-screen canvas. LZW codes are packed LSB-first; code width starts at
min_code_size+1 and grows to at most 12 bits; the decoder's width bump
lags the encoder's by one dictionary entry (the classic +1 asymmetry —
the decoder has not yet added the entry the encoder just created when
it reads the next code).

The encoder exists so fixtures can pin every rule: a real LZW
compressor (dictionary growth exercised by round-trips, not just
literal codes), global vs local palettes, and interlace. Per-pixel /
per-bit loops are fine — the codec targets small fixtures, like
functions/bmp.py; production decode swaps in a C codec behind the same
``operators/multimodal.decode_backend`` seam. Correctness is pinned
against INDEPENDENT artifacts in tests/test_gif.py (the canonical
published 1x1 GIF bytes and a hand-packed LZW worked example), not just
encoder round-trips.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_SIZE = 12


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    total_bits = len(data) * 8
    bitpos = 0
    out: list[int] = []
    table: list[list[int]] = []
    prev: list[int] | None = None

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + code_size > total_bits:
            raise ValueError("truncated GIF: LZW stream ended mid-code")
        v = 0
        for i in range(code_size):
            if data[(bitpos + i) >> 3] >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += code_size
        return v

    while True:
        code = read_code()
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError(
                    f"malformed GIF: first LZW code {code} after clear is "
                    "not a literal"
                )
            if not table:
                raise ValueError("malformed GIF: LZW data before any clear")
            prev = table[code]
            out.extend(prev)
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError(
                    f"malformed GIF: LZW code {code} beyond table"
                )
            table.append(prev + [entry[0]])
            out.extend(entry)
            prev = entry
            # decoder width bump: one entry BEHIND the encoder's (+1 rule)
            if len(table) == (1 << code_size) and code_size < _MAX_CODE_SIZE:
                code_size += 1
        if len(out) > n_pixels:
            raise ValueError("malformed GIF: LZW stream overruns the image")
        if len(out) == n_pixels:
            # image complete: real-world encoders may pack the END code
            # into bits that no longer exist (the canonical 1x1 GIF does)
            # — stopping here, not at END, is the spec-compliant read
            break
    if len(out) != n_pixels:
        raise ValueError(
            f"malformed GIF: LZW stream yields {len(out)} of {n_pixels} "
            "pixels"
        )
    return out


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    bits: list[int] = []

    def emit(code: int) -> None:
        for i in range(code_size):
            bits.append(code >> i & 1)

    emit(clear)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # encoder width bump: one entry AHEAD of the decoder's
        if next_code == (1 << code_size) + 1 and code_size < _MAX_CODE_SIZE:
            code_size += 1
        if next_code == (1 << _MAX_CODE_SIZE) + 1:
            emit(clear)  # dictionary full: reset (fixtures never hit this)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w])
    emit(end)
    out = bytearray()
    for i in range(0, len(bits), 8):
        out.append(sum(b << j for j, b in enumerate(bits[i:i + 8])))
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    """Source-row order of an interlaced image: rows 0,8,16.. then
    4,12.. then 2,6.. then 1,3,5.. (GIF89a appendix E)."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 3) uint8 RGB array (single-image GIFs).

    Raises ValueError on a non-GIF signature, a malformed/truncated
    stream, a missing color table, or a multi-frame file (the strict
    single-image contract — fail loudly, never return the wrong frame;
    animations go through decode_gif_frames)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("truncated GIF: missing screen descriptor")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            data, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n

    img = None
    try:
        img = _walk_blocks(data, pos, gct)
    except (IndexError, struct.error):
        raise ValueError("truncated GIF: stream ends inside a block")
    if img is None:
        raise ValueError("malformed GIF: no image block")
    return img


def _read_image_block(data: bytes, pos: int, gct):
    """Parse one image descriptor (+ optional local color table + LZW
    index stream) starting at `pos` (the byte AFTER the 0x2C introducer).
    Returns (left, top, idx array (h, w) int32, palette, new pos)."""
    left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
    pos += 9
    if w == 0 or h == 0:
        # without this, a zero-size frame surfaces numpy's opaque
        # zero-size-reduction error at arr.max() instead of a
        # codec-style message (r9 advisor finding)
        raise ValueError(f"malformed GIF: zero-size image {w}x{h}")
    palette = gct
    if ipacked & 0x80:  # local color table wins over global
        n = 2 << (ipacked & 0x07)
        palette = np.frombuffer(
            data, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    if palette is None:
        raise ValueError("malformed GIF: no color table for image")
    min_code_size = data[pos]
    pos += 1
    lzw = bytearray()
    while True:
        size = data[pos]
        pos += 1
        if size == 0:
            break
        lzw += data[pos:pos + size]
        pos += size
    idx = _lzw_decode(min_code_size, bytes(lzw), w * h)
    arr = np.array(idx, dtype=np.int32).reshape(h, w)
    if arr.max() >= len(palette):
        raise ValueError("malformed GIF: pixel index beyond palette")
    if ipacked & 0x40:  # interlaced: source rows arrive pass-ordered
        deinterlaced = np.empty_like(arr)
        deinterlaced[_interlace_order(h)] = arr
        arr = deinterlaced
    return left, top, arr, palette, pos


def _skip_extension(data: bytes, pos: int) -> int:
    """Skip an extension block's label + sub-blocks; pos is the byte
    AFTER the 0x21 introducer."""
    pos += 1
    while True:
        size = data[pos]
        pos += 1 + size
        if size == 0:
            break
    return pos


def _walk_blocks(data: bytes, pos: int, gct) -> np.ndarray | None:
    img = None
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: no trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos = _skip_extension(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"malformed GIF: unknown block 0x{block:02x}")
        if img is not None:
            raise ValueError(
                "multi-frame GIF: the single-image decoder stops here — "
                "decode_gif_frames handles animations"
            )
        left, top, arr, palette, pos = _read_image_block(data, pos, gct)
        if left or top:
            raise ValueError("unsupported GIF: offset image descriptor")
        img = palette[arr]
    return img


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False, local: bool = False) -> bytes:
    """(H, W) uint8 index array + (N, 3) palette -> single-image GIF.

    ``local=True`` writes the palette as a local color table (no global
    one) so fixtures pin the local-wins rule; ``interlace=True`` writes
    pass-ordered rows."""
    if indices.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("encode_gif expects (H, W) indices, (N, 3) palette")
    h, w = indices.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1
    if 2 << size_field != n:
        raise ValueError("palette length must be a power of two >= 2")
    pal_bytes = palette.astype(np.uint8).tobytes()
    out = bytearray(b"GIF89a")
    gct_flag = 0 if local else 0x80 | size_field
    out += struct.pack("<HHBBB", w, h, gct_flag, 0, 0)
    if not local:
        out += pal_bytes
    ipacked = (0x40 if interlace else 0) | (0x80 | size_field if local else 0)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipacked)
    if local:
        out += pal_bytes
    rows = indices[_interlace_order(h)] if interlace else indices
    min_code_size = max(2, size_field + 1)
    lzw = _lzw_encode(min_code_size, [int(v) for v in rows.ravel()])
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# --- GIF89a animation (multi-frame) -------------------------------------------
#
# An animated GIF is the same block stream with MANY image descriptors,
# each optionally preceded by a graphic-control extension (GCE, label
# 0xF9) carrying the frame's disposal method and transparency index.
# Frames are RECTS composited onto a shared logical-screen canvas:
# transparent-index pixels leave the underlying canvas untouched (how
# animations ship deltas), and the disposal method says what happens to
# the frame's rect AFTER it is shown — 0/1 leave it (the common case),
# 2 restores it to the background color, 3 restores it to what it held
# before the frame rendered (a pre-draw snapshot of the rect).


def decode_gif_frames(data: bytes) -> np.ndarray:
    """GIF bytes -> (n_frames, H, W, 3) uint8 composited RGB frames.

    H, W are the LOGICAL SCREEN dims: every frame is the full canvas as
    a viewer would show it at that point of the animation (frame rects
    composited over what earlier frames left behind). Single-image files
    yield n_frames == 1 with pixels identical to :func:`decode_gif`.
    Raises ValueError on malformed/truncated streams and frames that
    overflow the canvas. All four disposal methods are composited
    (0/1 leave, 2 background, 3 restore-to-previous)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("truncated GIF: missing screen descriptor")
    sw, sh = struct.unpack_from("<HH", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError(f"malformed GIF: zero-size screen {sw}x{sh}")
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            data, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    bg_color = (gct[bg_index] if gct is not None and bg_index < len(gct)
                else np.zeros(3, dtype=np.uint8))
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_color
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    try:
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF: no trailer")
            block = data[pos]
            pos += 1
            if block == 0x3B:
                break
            if block == 0x21:
                if data[pos] == 0xF9:  # graphic-control extension
                    size = data[pos + 1]
                    if size != 4:
                        raise ValueError(
                            f"malformed GIF: GCE block size {size}"
                        )
                    gpacked = data[pos + 2]
                    disposal = (gpacked >> 2) & 0x07
                    transparent = (data[pos + 5]
                                   if gpacked & 0x01 else None)
                pos = _skip_extension(data, pos)
                continue
            if block != 0x2C:
                raise ValueError(
                    f"malformed GIF: unknown block 0x{block:02x}"
                )
            left, top, arr, palette, pos = _read_image_block(data, pos, gct)
            h, w = arr.shape
            if left + w > sw or top + h > sh:
                raise ValueError(
                    f"malformed GIF: frame rect {w}x{h}@({left},{top}) "
                    f"overflows the {sw}x{sh} screen"
                )
            rect = canvas[top:top + h, left:left + w]
            # disposal 3 restores the rect to what it held BEFORE this
            # frame rendered — snapshot it pre-draw (spec: "restore the
            # area overwritten by the graphic with what was there prior
            # to rendering")
            prev_rect = rect.copy() if disposal == 3 else None
            pixels = palette[arr]
            if transparent is not None:
                keep = arr == transparent
                pixels = np.where(keep[:, :, None], rect, pixels)
            canvas[top:top + h, left:left + w] = pixels
            frames.append(canvas.copy())
            if disposal == 2:  # restore rect to background color
                canvas[top:top + h, left:left + w] = bg_color
            elif disposal == 3:  # restore rect to pre-frame content
                canvas[top:top + h, left:left + w] = prev_rect
            transparent = None  # a GCE governs exactly one image
            disposal = 0
    except (IndexError, struct.error):
        raise ValueError("truncated GIF: stream ends inside a block")
    if not frames:
        raise ValueError("malformed GIF: no image block")
    return np.stack(frames)


def encode_gif_frames(frames: list[dict], screen_wh: tuple[int, int],
                      global_palette: np.ndarray | None,
                      bg_index: int = 0) -> bytes:
    """Fixture encoder for ANIMATED GIFs. Each frame dict:

    - ``indices``: (h, w) uint8 index array (required)
    - ``left`` / ``top``: rect offset on the canvas (default 0)
    - ``palette``: (N, 3) LOCAL color table, or None -> global
    - ``transparent``: index drawn as transparent, or None
    - ``disposal``: GIF disposal method (default 0)

    A GCE is written before a frame iff transparency or a non-zero
    disposal is requested — so plain fixtures stay byte-minimal and the
    decoder's no-GCE path keeps coverage."""
    sw, sh = screen_wh

    def size_field_for(pal: np.ndarray) -> int:
        n = len(pal)
        field = max(1, (n - 1).bit_length()) - 1
        if 2 << field != n:
            raise ValueError("palette length must be a power of two >= 2")
        return field

    out = bytearray(b"GIF89a")
    if global_palette is not None:
        gfield = size_field_for(global_palette)
        out += struct.pack("<HHBBB", sw, sh, 0x80 | gfield, bg_index, 0)
        out += global_palette.astype(np.uint8).tobytes()
    else:
        out += struct.pack("<HHBBB", sw, sh, 0, bg_index, 0)
    for spec in frames:
        idx = spec["indices"]
        left, top = spec.get("left", 0), spec.get("top", 0)
        pal = spec.get("palette")
        transparent = spec.get("transparent")
        disposal = spec.get("disposal", 0)
        if transparent is not None or disposal:
            gpacked = (disposal & 0x07) << 2
            tidx = 0
            if transparent is not None:
                gpacked |= 0x01
                tidx = transparent
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, gpacked,
                               0, tidx, 0)
        h, w = idx.shape
        if pal is not None:
            lfield = size_field_for(pal)
            out += struct.pack("<BHHHHB", 0x2C, left, top, w, h,
                               0x80 | lfield)
            out += pal.astype(np.uint8).tobytes()
            field = lfield
        else:
            if global_palette is None:
                raise ValueError("frame without palette needs a global one")
            out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
            field = size_field_for(global_palette)
        min_code_size = max(2, field + 1)
        lzw = _lzw_encode(min_code_size, [int(v) for v in idx.ravel()])
        out.append(min_code_size)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
