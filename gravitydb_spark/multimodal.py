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


# ---------------------------------------------------------------------------
# WAV / RIFF PCM audio — same philosophy as the BMP codec above: a real
# fixed-layout format parsed from documented byte offsets, no codec libs.
# RIFF container = "RIFF" + u32 size + "WAVE" + a chunk walk; "fmt " holds
# format/channels/rate/bits, "data" holds interleaved little-endian PCM.
# ---------------------------------------------------------------------------

WAV_HEADER_SIZE = 44  # RIFF(12) + canonical fmt(8+16) + data chunk header(8)


def wav_file_size(n_channels: int, n_frames: int) -> int:
    """Byte size of a canonical 16-bit PCM WAV with no extra chunks."""
    return WAV_HEADER_SIZE + n_frames * n_channels * 2


def encode_wav(n_channels: int, sample_rate: int, n_frames: int, seed: int) -> bytes:
    """Synthesize a canonical 16-bit PCM WAV whose flat interleaved sample
    at index ``i`` (0 .. n_frames*n_channels-1) is
    ``((seed + 7*i) % 65536) - 32768`` — the closed form the DuckDB
    oracles recompute."""
    if n_channels <= 0 or n_frames <= 0 or sample_rate <= 0:
        raise ValueError("encode_wav needs positive channels/frames/rate")
    n_flat = n_frames * n_channels
    data = struct.pack(
        f"<{n_flat}h", *(((seed + 7 * i) % 65536) - 32768 for i in range(n_flat))
    )
    riff = struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * n_channels * 2,  # byte rate
        n_channels * 2,  # block align
        16,  # bits per sample
    )
    return riff + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(data: bytes) -> dict:
    """Parse a RIFF/WAVE file containing 16-bit PCM.

    A real chunk walk, not an offset-44 assumption: chunks are visited in
    order, unknown chunks (LIST, fact, cue …) are skipped via their
    declared sizes (odd sizes padded to the even boundary per RIFF), and
    only ``fmt `` and ``data`` are consumed. Returns ``{n_channels,
    sample_rate, bits, n_frames, data_bytes, sample_sum, peak}`` where
    ``sample_sum`` sums the decoded int16 samples and ``peak`` is the max
    absolute sample value."""
    if len(data) < 12:
        raise ValueError("truncated WAV: no RIFF header")
    magic, riff_size, wave = struct.unpack_from("<4sI4s", data, 0)
    if magic != b"RIFF" or wave != b"WAVE":
        raise ValueError(f"bad RIFF/WAVE magic {magic!r}/{wave!r}")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, csize = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + csize]
        if len(body) < csize:
            raise ValueError(f"truncated chunk {cid!r} at offset {pos}")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError(f"fmt chunk too small ({csize})")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + csize + (csize & 1)  # RIFF pads odd chunks to even
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported, got fmt={audio_format} bits={bits}")
    n_flat = len(pcm) // 2
    samples = struct.unpack(f"<{n_flat}h", pcm[: n_flat * 2])
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits": bits,
        "n_frames": n_flat // n_channels,
        "data_bytes": len(pcm),
        "sample_sum": sum(samples),
        "peak": max((abs(s) for s in samples), default=0),
        "samples": samples,
    }


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
