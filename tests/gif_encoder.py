"""Minimal GIF89a encoder for test fixtures — real LZW output (growing
code width) so the decoder's full path is exercised."""

from __future__ import annotations


class _BitWriter:
    """LSB-first bit packer (GIF byte order)."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    w = _BitWriter()
    w.write(clear, width)
    cur = b""
    for i in indices:
        nxt = cur + bytes([i])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        cur = bytes([i])
    if cur:
        w.write(table[cur], width)
    w.write(end, width)
    return w.flush()


def encode_gif(
    pixels: list[list[tuple[int, int, int]]],
    interlace: bool = False,
) -> bytes:
    """pixels[y][x] = (r, g, b) → GIF89a bytes (global palette built
    from the distinct colors; ≤ 256). ``interlace`` stores rows in the
    GIF89a 4-pass order and sets the descriptor flag."""
    h = len(pixels)
    w = len(pixels[0])
    colors = []
    cmap = {}
    for row in pixels:
        for c in row:
            if c not in cmap:
                cmap[c] = len(colors)
                colors.append(c)
    bits = 1
    while (1 << bits) < len(colors):
        bits += 1
    n_pal = 1 << bits
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (bits - 1))  # global table, 2^bits entries
    out += b"\x00\x00"  # background, aspect
    for i in range(n_pal):
        r, g, b = colors[i] if i < len(colors) else (0, 0, 0)
        out += bytes([r, g, b])
    out += b"\x2c" + b"\x00\x00\x00\x00"  # image descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlace else 0)  # no local table
    mcs = max(2, bits)
    out.append(mcs)
    row_order = range(h)
    if interlace:
        row_order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
    data = lzw_encode(
        [cmap[c] for y in row_order for c in pixels[y]], mcs
    )
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)
