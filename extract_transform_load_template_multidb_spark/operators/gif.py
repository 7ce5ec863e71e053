"""Pure-Python GIF87a codec — encode AND decode, no codec libs.

Implements the subset of the public GIF87a specification (CompuServe
1987; the format web scrapes still carry for simple graphics) that a
training-data pipeline meets: a single non-interlaced image frame with
a global color table, full variable-width LZW decompression on the
decode path (dictionary rebuild, CLEAR handling, the KwKwK
first-use-of-just-added-code case), and little-endian sub-block bit
packing. Interlaced frames, local color tables, and GIF89a extension
blocks beyond a plain skip raise ``NotImplementedError`` — the
documented out-of-scope tail, same posture as the JPEG codec's
progressive variants and the PNG codec's interlace.

The encoder emits a VALID LZW stream in the classic "uncompressed GIF"
form: literal root codes at a fixed 9-bit width with a CLEAR code
issued before the dictionary would force a width increase. Every
conformant decoder (including this module's) reconstructs the exact
pixels; compression ratio is simply forfeited — which is what makes the
encode→decode round trip bit-exact and therefore SQL-oracle-checkable,
the same determinism contract as `operators/png.py`.

Reference parity: the reference repo moves media blobs opaquely
(Extract-Transform-Load-Template-MultiDB carries no decoder); this
codec exists so the engine's Arrow-batched decode stage covers the
third of the three dominant web image formats (JPEG, PNG, GIF).
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER = b"GIF87a"


def encode_gif87a(indices: "np.ndarray", palette: "np.ndarray") -> bytes:
    """Encode an (h, w) uint8 index array + (n≤256, 3) palette as GIF87a.

    Uses the uncompressed-LZW technique: after an initial CLEAR, each
    pixel is emitted as its literal root code at the fixed initial
    width, with a CLEAR re-issued every time the (never-consulted)
    dictionary would otherwise grow past the current width — the stream
    stays spec-valid for any decoder while the encoder stays trivial
    and deterministic.
    """
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if indices.ndim != 2 or indices.size == 0:
        raise ValueError("indices must be a non-empty (h, w) array")
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (n<=256, 3)")
    h, w = indices.shape
    # Global color table size: 2^(k+1) >= len(palette), min 2 entries.
    k = 0
    while (2 << k) < len(palette):
        k += 1
    table_n = 2 << k
    min_code = max(2, k + 1)  # LZW minimum code size (spec floor 2)
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1

    out = bytearray()
    out += _HEADER
    out += struct.pack("<HHBBB", w, h, 0x80 | (k << 4) | k, 0, 0)
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)

    # Bit-pack codes little-endian into 255-byte sub-blocks.
    acc = 0
    nbits = 0
    data = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # Dictionary would grow by one entry per emitted pixel (after the
    # first); re-CLEAR before it reaches 2^width so width never changes.
    budget = (1 << width) - eoi - 2
    count = 0
    for v in indices.ravel():
        v = int(v)
        if v >= table_n:
            raise ValueError("pixel index outside the color table")
        if count >= budget:
            emit(clear)
            count = 0
        emit(v)
        count += 1
    emit(eoi)
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def parse_gif(payload: bytes) -> tuple[int, int, "np.ndarray", "np.ndarray"]:
    """Decode a single-frame non-interlaced GIF87a/89a.

    Returns ``(width, height, palette, pixels)`` with ``palette`` an
    (n, 3) uint8 array and ``pixels`` an (h, w) uint8 INDEX array
    (callers map through the palette for RGB). Full variable-width LZW:
    dictionary rebuild on CLEAR, width growth at 2^width, the KwKwK
    case. Raises ``ValueError`` on malformed payloads and
    ``NotImplementedError`` on interlaced frames or local color
    tables.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = np.zeros((2, 3), dtype=np.uint8)
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        need = n * 3
        if pos + need > len(payload):
            raise ValueError("truncated global color table")
        palette = np.frombuffer(
            payload[pos : pos + need], dtype=np.uint8
        ).reshape(n, 3)
        pos += need
    # Walk blocks to the first image descriptor.
    while True:
        if pos >= len(payload):
            raise ValueError("no image descriptor before end of data")
        b = payload[pos]
        pos += 1
        if b == 0x2C:
            break
        if b == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(payload):
                raise ValueError("truncated extension block")
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated extension sub-block")
                sz = payload[pos]
                pos += 1 + sz
                if sz == 0:
                    break
        elif b == 0x3B:
            raise ValueError("trailer before any image data")
        else:
            raise ValueError(f"unexpected block introducer 0x{b:02x}")
    if pos + 9 > len(payload):
        raise ValueError("truncated image descriptor")
    _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIF not supported")
    if ipacked & 0x80:
        raise NotImplementedError("local color table not supported")
    if iw < 1 or ih < 1:
        raise ValueError("invalid GIF frame dimensions")
    if pos >= len(payload):
        raise ValueError("missing LZW minimum code size")
    min_code = payload[pos]
    pos += 1
    if not 2 <= min_code <= 11:
        raise ValueError(f"invalid LZW minimum code size {min_code}")

    # Concatenate the data sub-blocks.
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated image sub-blocks")
        sz = payload[pos]
        pos += 1
        if sz == 0:
            break
        data += payload[pos : pos + sz]
        if pos + sz > len(payload):
            raise ValueError("truncated image sub-block data")
        pos += sz

    clear = 1 << min_code
    eoi = clear + 1
    n_pixels = iw * ih
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # LZW decode. Dictionary entries are (prefix_code, last_byte);
    # roots are implicit. Rebuilt on CLEAR.
    prefix = np.zeros(4096, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    stack = bytearray()

    width = min_code + 1
    next_code = eoi + 1
    prev = -1
    acc = 0
    nbits = 0
    i = 0
    while n_out < n_pixels:
        while nbits < width:
            if i >= len(data):
                raise ValueError("LZW stream ended before all pixels")
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            raise ValueError("LZW EOI before all pixels decoded")
        if code >= next_code or (prev < 0 and code >= clear):
            if not (code == next_code and prev >= 0):
                raise ValueError("corrupt LZW code")
        # Expand `code` (or the KwKwK case) onto the stack.
        stack.clear()
        c = code
        if code == next_code:  # KwKwK: prev string + its first byte
            c = prev
            kwk = True
        else:
            kwk = False
        while c >= eoi + 1:
            stack.append(int(suffix[c]))
            c = int(prefix[c])
        if c >= clear:
            raise ValueError("corrupt LZW prefix chain")
        stack.append(c)
        first = stack[-1]
        if kwk:
            stack.insert(0, first)
        if n_out + len(stack) > n_pixels:
            raise ValueError("LZW produced more pixels than the frame")
        for b2 in reversed(stack):
            out[n_out] = b2
            n_out += 1
        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if (out >= len(palette)).any():
        raise ValueError("pixel index outside the color table")
    return iw, ih, palette, out.reshape(ih, iw)
