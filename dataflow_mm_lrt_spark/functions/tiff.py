"""Pure-numpy baseline TIFF 6.0 codec (strips, 8-bit, chunky).

Completes the still-image codec set (PNG/GIF/JPEG/BMP/PPM) with the
archival/scan format the reference reads via PIL (utils/utils.py:
_load_image). Coverage: both byte orders (II/MM), strip organization,
Compression 1 (none), 32773 (PackBits) and 5 (TIFF-LZW, MSB-first with
EarlyChange), Predictor 2 (horizontal differencing), grayscale
(BlackIsZero/WhiteIsZero), RGB and RGBA (alpha dropped to match the
(H, W, 3) pipeline contract). Tiled layout, 16-bit samples, planar
configuration 2 and other compressions raise ``CodecUnavailable`` —
the PIL import-try in functions/codecs.py stays the upgrade path.

TIFF-LZW differs from GIF's LZW (functions/gif.py) in three published
ways (TIFF 6.0 §13): codes pack MSB-first (GIF: LSB-first), the table
has fixed Clear=256/EOI=257 with first dynamic code 258, and the code
width increments one code EARLY ("EarlyChange": at table size 511/1023/
2047 rather than 512/1024/2048).

Validation (tests/test_tiff.py): PackBits against the worked example
bytes published in the TIFF 6.0 specification itself, LZW + predictor
via encoder→decoder round-trips plus a hand-built minimal LZW vector,
and decode parity for the same pixels across both byte orders and all
three compressions.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecUnavailable

# tag ids (TIFF 6.0 §8)
_WIDTH, _LENGTH, _BITS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP = 262, 273, 277, 278
_STRIP_COUNTS, _PLANAR, _PREDICTOR = 279, 284, 317
_TILE_WIDTH, _TILE_LENGTH = 322, 323

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 §9 PackBits: n in 0..127 → copy n+1 literal bytes;
    n in -127..-1 → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    dn = len(data)
    outlen = 0
    while i < dn and outlen < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            outlen += n + 1
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            outlen += 257 - n
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    """Run-length PackBits encoder (greedy: runs ≥ 3 become repeats).

    Vectorized restatement of the byte-at-a-time greedy scan (same
    output bytes): R[i] = remaining equal-byte run at i from the change
    points; a repeat token consumes min(R, 128); a literal block ends
    at the next position whose (uncapped) run is ≥ 3, the 128 cap, or
    end of data — the per-token walk replaces three nested per-byte
    loops."""
    n = len(data)
    if n == 0:
        return b""
    arr = np.frombuffer(data, dtype=np.uint8)
    # change[c] = start of each maximal equal run; R[i] = run end - i
    change = np.flatnonzero(np.diff(arr.astype(np.int16)) != 0) + 1
    ends = np.append(change, n)  # run end for each maximal run
    run_id = np.zeros(n, dtype=np.int64)
    run_id[change] = 1
    run_id = np.cumsum(run_id)
    R = ends[run_id] - np.arange(n)
    pos3 = np.flatnonzero(R >= 3)  # literal-break positions
    Rl = R.tolist()
    out = bytearray()
    i = 0
    p3i = 0
    np3 = len(pos3)
    while i < n:
        r = Rl[i]
        if r >= 3:
            run = 128 if r > 128 else r
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # next literal break at/after i (monotone scan over pos3)
        while p3i < np3 and pos3[p3i] < i:
            p3i += 1
        j = int(pos3[p3i]) if p3i < np3 else n
        if j > i + 128:
            j = i + 128
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-LZW (TIFF 6.0 §13): MSB-first bit order, Clear=256, EOI=257,
    EarlyChange code-width bump at table sizes 511/1023/2047."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    acc = nbits = 0
    pos = 0
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    dn = len(data)
    tlen = len(table)
    outlen = 0
    while outlen < expected:
        while nbits < width:
            if pos >= dn:
                return bytes(out[:expected])
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            reset()
            tlen = len(table)
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < tlen:
            entry = table[code]
            table.append(prev + entry[:1])
            tlen += 1
        elif code == tlen:
            entry = prev + prev[:1]
            table.append(entry)
            tlen += 1
        else:
            raise ValueError("corrupt TIFF-LZW stream")
        out += entry
        outlen += len(entry)
        prev = entry
        # EarlyChange: width grows one code before the table fills
        if tlen == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW encoder (EarlyChange, Clear at table-full like the spec
    suggests) — fixture generator for the decoder's round-trip tests."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1

    # int-keyed table — "prefix + byte" keyed as (prefix_code << 8) |
    # byte; same automaton as the bytes-keyed dict, bit-identical
    # stream, no per-byte bytes concatenation (see gif.lzw_encode).
    # Code emission is inlined (the `put` closure's nonlocal writes cost
    # ~0.5 us per emitted code); `put` above remains for the tail path.
    table: dict[int, int] = {}
    get = table.get
    append = out.append
    next_code = 258
    width = 9
    put(CLEAR, width)
    w = -1
    for b in data:
        if w < 0:
            w = b
            continue
        key = (w << 8) | b
        nc = get(key)
        if nc is not None:
            w = nc
            continue
        acc = (acc << width) | w
        nbits += width
        while nbits >= 8:
            nbits -= 8
            append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1
        table[key] = next_code
        next_code += 1
        # width pairing: the decoder's table trails this one by exactly
        # one entry, and it bumps (EarlyChange) when ITS size hits
        # (1 << width) - 1 — so the encoder bumps at the natural
        # boundary (1 << width), keeping every code the same width on
        # both sides (boundary-crossing round-trips pin this in tests)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: reset
            put(CLEAR, width)
            table = {}
            get = table.get
            next_code = 258
            width = 9
        w = b
    if w >= 0:
        put(w, width)
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _read_ifd(buf: bytes, e: str) -> dict[int, list]:
    (off,) = struct.unpack_from(e + "I", buf, 4)
    (n_entries,) = struct.unpack_from(e + "H", buf, off)
    tags: dict[int, list] = {}
    for i in range(n_entries):
        tag, typ, count = struct.unpack_from(e + "HHI", buf, off + 2 + 12 * i)
        size = _TYPE_SIZE.get(typ, 1) * count
        vpos = off + 2 + 12 * i + 8
        if size > 4:
            (vpos,) = struct.unpack_from(e + "I", buf, vpos)
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            continue  # rationals/undefined: not needed here
        tags[tag] = list(struct.unpack_from(e + str(count) + fmt, buf, vpos))
    return tags


def decode_tiff(buf: bytes) -> np.ndarray:
    """(H, W, 3) uint8 from a strip-organized 8-bit baseline TIFF."""
    if buf[:4] == b"II*\x00":
        e = "<"
    elif buf[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    tags = _read_ifd(buf, e)
    if _TILE_WIDTH in tags or _TILE_LENGTH in tags:
        raise CodecUnavailable("tiled TIFF not supported — install PIL")
    w = tags[_WIDTH][0]
    h = tags[_LENGTH][0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise CodecUnavailable(f"{bits}-bit TIFF not supported — install PIL")
    if tags.get(_PLANAR, [1])[0] != 1:
        raise CodecUnavailable("planar TIFF not supported — install PIL")
    comp = tags.get(_COMPRESSION, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    photometric = tags.get(_PHOTOMETRIC, [1])[0]
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0]
    offsets = tags[_STRIP_OFFSETS]
    counts = tags.get(_STRIP_COUNTS, [len(buf) - offsets[0]])

    row_bytes = w * spp
    raw = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = n_rows * row_bytes
        chunk = bytes(buf[o : o + c])
        if comp == 1:
            raw += chunk[:expected]
        elif comp == 32773:
            raw += packbits_decode(chunk, expected)
        elif comp == 5:
            raw += lzw_decode(chunk, expected)
        else:
            raise CodecUnavailable(
                f"TIFF compression {comp} not supported — install PIL"
            )
    if len(raw) < h * row_bytes:
        raise ValueError("truncated TIFF pixel data")
    img = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8).reshape(
        h, w, spp
    )
    if predictor == 2:
        # horizontal differencing stores per-row deltas mod 256: undo
        # with a wrapping cumsum (uint8 accumulator — a promoted dtype
        # would overflow-clip on wide rows instead of wrapping)
        img = np.cumsum(img, axis=1, dtype=np.uint8)
    elif predictor != 1:
        raise CodecUnavailable(f"TIFF predictor {predictor} not supported")
    if spp == 1:
        g = 255 - img[..., 0] if photometric == 0 else img[..., 0]
        return np.repeat(g[..., None], 3, axis=2)
    return np.ascontiguousarray(img[..., :3])  # RGBA → drop alpha


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    byte_order: str = "<",
    rows_per_strip: int | None = None,
    predictor: int = 1,
) -> bytes:
    """Encode (H, W, 3) or (H, W) uint8 as a strip-organized TIFF.
    ``compression``: 1 (none), 5 (LZW) or 32773 (PackBits)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else img.shape[2]
    pixels = img[..., None] if gray else img
    if predictor == 2:
        d = pixels.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        pixels = (d & 0xFF).astype(np.uint8)
    rows_per_strip = rows_per_strip or h
    e = byte_order
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = pixels[y0 : y0 + rows_per_strip].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(lzw_encode(raw))
        elif compression == 32773:
            strips.append(packbits_encode(raw))
        else:
            raise ValueError(f"compression {compression}")

    entries = []  # (tag, type, count, value_or_values)
    n_strips = len(strips)

    def short(tag, *vals):
        entries.append((tag, 3, len(vals), list(vals)))

    def long(tag, *vals):
        entries.append((tag, 4, len(vals), list(vals)))

    short(_WIDTH, w)
    short(_LENGTH, h)
    short(_BITS, *([8] * spp))
    short(_COMPRESSION, compression)
    short(_PHOTOMETRIC, 1 if gray else 2)
    long(_STRIP_OFFSETS, *([0] * n_strips))  # patched below
    short(_SPP, spp)
    short(_ROWS_PER_STRIP, rows_per_strip)
    long(_STRIP_COUNTS, *[len(s) for s in strips])
    short(_PLANAR, 1)
    if predictor != 1:
        short(_PREDICTOR, predictor)
    entries.sort()

    header = struct.pack(e + "2sHI", b"II" if e == "<" else b"MM", 42, 8)
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    # overflow area for >4-byte values, then strip data
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()
    fixed = []
    for tag, typ, count, vals in entries:
        sz = _TYPE_SIZE[typ] * count
        fmt = _TYPE_FMT[typ]
        if sz <= 4:
            packed = struct.pack(e + str(count) + fmt, *vals)
            packed += b"\x00" * (4 - len(packed))
            fixed.append((tag, typ, count, packed, None))
        else:
            fixed.append((tag, typ, count, None, len(overflow)))
            overflow += struct.pack(e + str(count) + fmt, *vals)
    data_off = overflow_off + len(overflow)
    # patch strip offsets now that layout is known
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    out = bytearray(header)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, count, packed, ovr in fixed:
        out += struct.pack(e + "HHI", tag, typ, count)
        if packed is not None:
            if tag == _STRIP_OFFSETS:
                packed = struct.pack(e + str(count) + "I", *strip_offsets)
                packed += b"\x00" * (4 - len(packed))
            out += packed
        else:
            out += struct.pack(e + "I", overflow_off + ovr)
    out += struct.pack(e + "I", 0)  # no next IFD
    ovf = bytes(overflow)
    # patch strip-offset values living in the overflow area
    for tag, typ, count, packed, ovr in fixed:
        if tag == _STRIP_OFFSETS and ovr is not None:
            patched = struct.pack(e + str(count) + "I", *strip_offsets)
            ovf = ovf[:ovr] + patched + ovf[ovr + len(patched):]
    out += ovf
    for s in strips:
        out += s
    return bytes(out)
