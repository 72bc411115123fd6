"""GIF87a/89a codec: palette images with real LZW, from scratch.

Third member of the stdlib-free codec family (`core/png.py`, `core/wav.py`
— SURVEY §2 multimodal): encoder emits header → logical screen descriptor
→ global color table → image descriptor → LZW-compressed index stream in
255-byte sub-blocks → trailer; decoder parses the same, skips 0x21
extension blocks, and inflates the variable-width LZW code stream
(LSB-first packing, clear/EOI codes, width growth to 12 bits, KwKwK
first-use case, mid-stream clear on dictionary overflow).

Deliberately unsupported (raise, never garbage): interlaced images,
local color tables, and multi-frame animations — single-frame palette
stills are the crawl-asset case.
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    pass


def _bits_for(n: int) -> int:
    b = 1
    while (1 << b) < n:
        b += 1
    return b


class _BitWriter:
    """LSB-first bit packer (GIF's LZW stream order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise GifError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    w = _BitWriter()

    def reset():
        return (
            {bytes([i]): i for i in range(clear)},
            end + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    w.write(clear, width)
    cur = b""
    for b in indices:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        w.write(table[cur], width)
        if next_code == 4096:
            w.write(clear, width)
            table, next_code, width = reset()
        else:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        cur = bytes([b])
    if cur:
        w.write(table[cur], width)
        # the decoder adds one more table entry after the final data
        # code; when that lands on its early-change boundary it reads
        # END one bit wider — mirror the bump so END's width matches
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    w.write(end, width)
    return w.finish()


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    r = _BitReader(data)
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            end + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: bytes | None = None
    while True:
        code = r.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise GifError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            # the decoder's table lags the encoder's by one entry, so
            # the width change fires one code earlier than the
            # encoder's next_code == (1 << width) condition
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry


def encode_gif(
    width: int, height: int, palette: list[tuple[int, int, int]],
    indices: bytes,
) -> bytes:
    """Single-frame GIF89a. Palette is padded to the next power of two
    (min 2); `indices` is row-major, len == width*height."""
    if len(indices) != width * height:
        raise GifError("indices length != width*height")
    if not 1 <= len(palette) <= 256:
        raise GifError("palette size out of range")
    if indices and max(indices) >= len(palette):
        raise GifError("index out of palette range")
    bits = max(_bits_for(len(palette)), 1)
    size = 1 << bits
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, bits-1 color resolution
    out += struct.pack(
        "<HHBBB", width, height, 0x80 | ((bits - 1) << 4) | (bits - 1),
        0, 0,
    )
    for i in range(size):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    mcs = max(bits, 2)
    out.append(mcs)
    lzw = _lzw_encode(indices, mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def parse_gif(data: bytes) -> dict:
    """→ {width, height, palette: list[(r,g,b)], indices: bytes}."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF signature")
    if len(data) < 13:
        raise GifError("truncated header")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise GifError("truncated color table")
        for i in range(n):
            palette.append(tuple(data[pos + 3 * i : pos + 3 * i + 3]))
        pos += 3 * n
    while True:
        if pos >= len(data):
            raise GifError("missing trailer")
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer before any image
            raise GifError("no image data")
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while True:
                if pos >= len(data):
                    raise GifError("truncated extension")
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
            continue
        if b == 0x2C:
            break
        raise GifError(f"unexpected block 0x{b:02x}")
    if pos + 9 > len(data):
        raise GifError("truncated image descriptor")
    _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
    pos += 9
    if iflags & 0x40:
        raise GifError("interlaced GIF not supported")
    if iflags & 0x80:
        raise GifError("local color table not supported")
    if not palette:
        raise GifError("no color table")
    mcs = data[pos]
    pos += 1
    if mcs > 11:
        raise GifError("LZW min code size > 11")
    lzw = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated image data")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        lzw += data[pos : pos + n]
        pos += n
    indices = _lzw_decode(bytes(lzw), mcs)
    if len(indices) < w * h:
        raise GifError("pixel data short")
    if indices and max(indices[: w * h]) >= len(palette):
        raise GifError("pixel index out of palette range")
    return {
        "width": w, "height": h, "palette": palette,
        "indices": indices[: w * h],
    }
