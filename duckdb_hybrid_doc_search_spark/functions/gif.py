"""Pure-stdlib GIF codec (GIF87a/89a, single-image).

Third REAL bytes->pixels decode path in this container, covering the two
failure classes the other codecs don't reach: LZW entropy coding with
growing code widths (PNG uses zlib's deflate via the stdlib; BMP has no
entropy coding) and PALETTE INDIRECTION (both other codecs store
samples directly; GIF stores indices into a color table, global or
local, so a palette mix-up permutes colors without changing a single
index). Interlaced images add a third layout rule (the 8/8/4/2 row
pass ordering).

The format is public (GIF89a specification, CompuServe 1990): 6-byte
signature, logical screen descriptor, optional global color table,
extension blocks (skipped — animation/transparency control doesn't
affect first-frame pixels), one image descriptor with optional local
color table, then the LZW-compressed index stream in length-prefixed
sub-blocks. LZW codes are packed LSB-first; code width starts at
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
    stream, a missing color table, or a multi-frame file (animation is
    out of scope for the fixture codec — fail loudly, never return the
    wrong frame)."""
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
            pos += 1
            while True:
                size = data[pos]
                pos += 1 + size
                if size == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"malformed GIF: unknown block 0x{block:02x}")
        if img is not None:
            raise ValueError(
                "multi-frame GIF: the fixture codec decodes single-image "
                "files only"
            )
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if left or top:
            raise ValueError("unsupported GIF: offset image descriptor")
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
