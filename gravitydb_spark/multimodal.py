"""Dependency-free BMP codec for the multimodal binary-column operators.

The reference engine has no multimodal surface; this implements the
mandated "image/audio/video as opaque binary columns" capability with a
REAL byte-level decoder instead of a stubbed codec: 24-bit uncompressed
Windows BMP (BITMAPINFOHEADER) is a fixed-layout format that needs no
codec libraries — magic, file size, pixel-array offset, width, height and
bit depth sit at documented byte offsets, and the pixel array is raw BGR
rows, bottom-up, each padded to a 4-byte boundary.

``encode_bmp`` deterministically synthesizes a well-formed BMP from
(width, height, seed) — the test-data generator for the pipeline.
``decode_bmp`` parses ANY conforming 24-bit BMP (including top-down
negative-height images and files with trailing garbage) back to header
fields + top-down row-major pixel rows. The Spark operators in
``pipeline_queries`` run ``decode_bmp`` inside Arrow-batched
``mapInPandas`` kernels; their DuckDB oracles mirror the *generator's*
closed-form pixel arithmetic, so a decoder that mis-parses padding, row
order, or header offsets hash-mismatches immediately.

Padding bytes are written as 0xAA (not 0x00) so a decoder that sums the
padded row instead of the 3*width pixel bytes produces a visibly wrong
checksum.
"""

from __future__ import annotations

import struct

HEADER_SIZE = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER
PAD_BYTE = 0xAA


def row_size(width: int) -> int:
    """Bytes per stored pixel row: 3*width rounded up to 4-byte boundary."""
    return (3 * width + 3) // 4 * 4


def file_size(width: int, height: int) -> int:
    return HEADER_SIZE + row_size(width) * abs(height)


def encode_bmp(width: int, height: int, seed: int) -> bytes:
    """Synthesize a 24-bit BMP whose pixel byte at top-down row-major
    linear index ``i`` (BGR within pixel, padding excluded) is
    ``(seed + i) % 256`` — the closed form the DuckDB oracles recompute.
    """
    if width <= 0 or height <= 0:
        raise ValueError("encode_bmp needs positive dimensions")
    rsize = row_size(width)
    fsize = HEADER_SIZE + rsize * height
    header = struct.pack("<2sIHHI", b"BM", fsize, 0, 0, HEADER_SIZE)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,  # BITMAPINFOHEADER size
        width,
        height,  # positive = bottom-up row storage
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB, uncompressed
        rsize * height,
        2835,  # 72 DPI in px/metre
        2835,
        0,
        0,
    )
    pad = bytes([PAD_BYTE]) * (rsize - 3 * width)
    rows = []
    for y in range(height - 1, -1, -1):  # stored bottom-up
        base = seed + y * width * 3
        row = bytes((base + j) % 256 for j in range(width * 3))
        rows.append(row + pad)
    return header + dib + b"".join(rows)


def decode_bmp(data: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP from raw bytes.

    Returns ``{width, height, bpp, file_size, pixel_sum, rows}`` where
    ``rows`` is a list of ``height`` bytes objects of length ``3*width``
    in TOP-DOWN order (bottom-up storage un-flipped, negative-height
    top-down files passed through), padding stripped, and ``pixel_sum``
    is the sum of all 3*width*height pixel bytes (padding excluded).
    """
    if len(data) < HEADER_SIZE:
        raise ValueError("truncated BMP: no room for headers")
    magic, fsize, _r1, _r2, pixel_offset = struct.unpack_from("<2sIHHI", data, 0)
    if magic != b"BM":
        raise ValueError(f"bad BMP magic {magic!r}")
    dib_size, width, height, planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    if bpp != 24:
        raise ValueError(f"only 24bpp supported, got {bpp}")
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise ValueError(f"only uncompressed (BI_RGB) supported, got {compression}")
    top_down = height < 0
    h = abs(height)
    rsize = row_size(width)
    if pixel_offset + rsize * h > len(data):
        raise ValueError("truncated BMP: pixel array exceeds data")
    stored = [
        bytes(data[pixel_offset + ry * rsize : pixel_offset + ry * rsize + 3 * width])
        for ry in range(h)
    ]
    rows = stored if top_down else stored[::-1]
    return {
        "width": width,
        "height": h,
        "bpp": bpp,
        "file_size": fsize,
        "pixel_sum": sum(sum(r) for r in rows),
        "rows": rows,
    }


def decode_bmp_stream(data: bytes) -> list:
    """Parse a concatenation of BMP files (an MJPEG-style frame container:
    each frame's byte length is its own header's file-size field) into a
    list of ``decode_bmp`` dicts. Raises on trailing non-BMP bytes."""
    frames = []
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < HEADER_SIZE:
            raise ValueError(f"trailing garbage at offset {pos}")
        (fsize,) = struct.unpack_from("<I", data, pos + 2)
        if fsize < HEADER_SIZE or pos + fsize > n:
            raise ValueError(f"bad frame size {fsize} at offset {pos}")
        frames.append(decode_bmp(data[pos : pos + fsize]))
        pos += fsize
    return frames


def nearest_resize(rows: list, width: int, height: int, tw: int, th: int) -> bytes:
    """Nearest-neighbor resample of decoded top-down pixel rows to
    ``tw``×``th``; returns the resized pixel bytes in top-down row-major
    BGR order (the same linear layout ``encode_bmp`` seeds)."""
    out = bytearray()
    for ty in range(th):
        sy = ty * height // th
        src = rows[sy]
        for tx in range(tw):
            sx = tx * width // tw
            out.extend(src[sx * 3 : sx * 3 + 3])
    return bytes(out)
