"""Byte-level tests for the multimodal BMP codec (multimodal.py) and the
mapInPandas decode operators built on it.

The crafted-image tests build BMP byte strings BY HAND (literal headers +
pixel rows, independent of encode_bmp) so they catch a codec that only
round-trips with its own encoder: padding stripping, bottom-up row
un-flipping, top-down negative-height handling, and container boundary
stepping are each pinned against hand-computed values.
"""

import struct

import pytest

from gravitydb_spark.multimodal import (
    PAD_BYTE,
    decode_bmp,
    decode_bmp_stream,
    encode_bmp,
    file_size,
    nearest_resize,
    row_size,
)


def _hand_bmp(width, height, rows_topdown, *, store_topdown=False, pad=b"\xaa"):
    """Hand-assemble a 24bpp BMP from explicit top-down pixel rows,
    without calling encode_bmp."""
    rsize = row_size(width)
    fsize = 54 + rsize * abs(height)
    stored_h = -height if store_topdown else height
    head = struct.pack("<2sIHHI", b"BM", fsize, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, stored_h, 1, 24, 0, rsize * height, 0, 0, 0, 0
    )
    padding = pad * (rsize - 3 * width)
    stored = rows_topdown if store_topdown else rows_topdown[::-1]
    return head + dib + b"".join(r + padding for r in stored)


class TestCraftedImages:
    # 2x2 image, rows given top-down; row stride is 8 so each stored row
    # carries 2 padding bytes that must NOT reach pixel_sum
    ROWS = [bytes([10, 20, 30, 40, 50, 60]), bytes([1, 2, 3, 4, 5, 6])]

    def test_bottom_up_decode(self):
        data = _hand_bmp(2, 2, self.ROWS)
        img = decode_bmp(data)
        assert (img["width"], img["height"], img["bpp"]) == (2, 2, 24)
        assert img["file_size"] == len(data) == 54 + 8 * 2
        assert img["rows"] == self.ROWS  # un-flipped back to top-down
        assert img["pixel_sum"] == sum(sum(r) for r in self.ROWS)  # no padding

    def test_top_down_negative_height(self):
        # negative height = rows stored top-down; decode must NOT flip
        data = _hand_bmp(2, 2, self.ROWS, store_topdown=True)
        assert decode_bmp(data)["rows"] == self.ROWS

    def test_padding_excluded_even_when_nonzero(self):
        a = _hand_bmp(2, 2, self.ROWS, pad=b"\x00")
        b = _hand_bmp(2, 2, self.ROWS, pad=b"\xff")
        assert decode_bmp(a)["pixel_sum"] == decode_bmp(b)["pixel_sum"]

    def test_rejects_malformed(self):
        good = _hand_bmp(2, 2, self.ROWS)
        with pytest.raises(ValueError):
            decode_bmp(b"PNG" + good[3:])  # bad magic
        with pytest.raises(ValueError):
            decode_bmp(good[:20])  # truncated header
        with pytest.raises(ValueError):
            decode_bmp(good[:-4])  # truncated pixel array
        bad_bpp = bytearray(good)
        struct.pack_into("<H", bad_bpp, 28, 8)
        with pytest.raises(ValueError):
            decode_bmp(bytes(bad_bpp))

    def test_container_demux(self):
        one = _hand_bmp(2, 2, self.ROWS)
        two = _hand_bmp(1, 1, [bytes([7, 8, 9])])
        frames = decode_bmp_stream(one + two)
        assert [(f["width"], f["height"]) for f in frames] == [(2, 2), (1, 1)]
        assert frames[1]["pixel_sum"] == 24
        with pytest.raises(ValueError):
            decode_bmp_stream(one + two + b"JUNK")

    def test_nearest_resize_hand_computed(self):
        # 2x2 -> 4x4 upsample: target (ty,tx) reads source (ty*2//4, tx*2//4)
        img = decode_bmp(_hand_bmp(2, 2, self.ROWS))
        out = nearest_resize(img["rows"], 2, 2, 4, 4)
        px = [self.ROWS[y][x * 3 : x * 3 + 3] for y in (0, 0, 1, 1) for x in (0, 0, 1, 1)]
        assert out == b"".join(px)
        assert len(out) == 4 * 4 * 3


class TestEncoderContract:
    def test_linear_seed_layout_and_sizes(self):
        for w, h, seed in [(4, 3, 0), (16, 9, 12345), (5, 7, 250)]:
            data = encode_bmp(w, h, seed)
            assert len(data) == file_size(w, h)
            img = decode_bmp(data)
            flat = b"".join(img["rows"])
            assert list(flat) == [(seed + i) % 256 for i in range(w * h * 3)]

    def test_padding_byte_is_nonzero(self):
        # 0xAA padding means a decoder that sums whole stored rows gets a
        # visibly wrong checksum — keep it that way
        data = encode_bmp(2, 1, 0)
        assert data[54 + 6 : 54 + 8] == bytes([PAD_BYTE, PAD_BYTE])


class TestSparkOperators:
    def test_binary_meta_parses_real_bytes(self, spark, sf_dir):
        from gravitydb_spark.pipeline_queries import multimodal_binary_meta

        rows = {r["doc_id"]: r for r in multimodal_binary_meta(spark, sf_dir).collect()}
        assert rows
        d = min(rows)
        w, h = 4 + d % 13, 3 + d % 7
        assert rows[d]["n_bytes"] == file_size(w, h)
        assert rows[d]["header_sig"] == f"{w:04x}{h:04x}18"

    def test_frame_sample_fanout(self, spark, sf_dir):
        from gravitydb_spark.pipeline_queries import N_FRAMES, multimodal_frame_sample

        df = multimodal_frame_sample(spark, sf_dir)
        counts = df.groupBy("doc_id").count().select("count").distinct().collect()
        assert [r["count"] for r in counts] == [N_FRAMES]


def _hand_wav(samples, *, channels=1, rate=8000, extra_chunk=None, bits=16):
    """Hand-assemble a RIFF/WAVE from explicit int16 samples, without
    calling encode_wav; extra_chunk=(id, body) is inserted BEFORE the
    data chunk so the decoder must actually walk chunks to find it."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    chunks = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, rate,
        rate * channels * 2, channels * 2, bits,
    )
    if extra_chunk is not None:
        cid, body = extra_chunk
        chunks += struct.pack("<4sI", cid, len(body)) + body
        if len(body) % 2:
            chunks += b"\x00"  # RIFF even-boundary pad
    chunks += struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


class TestCraftedWav:
    SAMPLES = [0, 100, -100, 32767, -32768, 7]

    def test_basic_decode(self):
        from gravitydb_spark.multimodal import decode_wav

        wav = decode_wav(_hand_wav(self.SAMPLES, channels=2, rate=16000))
        assert (wav["n_channels"], wav["sample_rate"], wav["bits"]) == (2, 16000, 16)
        assert wav["n_frames"] == 3
        assert wav["data_bytes"] == 12
        assert wav["sample_sum"] == sum(self.SAMPLES)
        assert wav["peak"] == 32768
        assert list(wav["samples"]) == self.SAMPLES

    def test_chunk_walk_skips_unknown_chunks(self):
        from gravitydb_spark.multimodal import decode_wav

        # odd-sized LIST chunk before data: decoder must skip by declared
        # size + the RIFF even-boundary pad byte to land on "data"
        wav = decode_wav(
            _hand_wav(self.SAMPLES, extra_chunk=(b"LIST", b"INFOxyz"))
        )
        assert wav["sample_sum"] == sum(self.SAMPLES)
        assert wav["n_frames"] == len(self.SAMPLES)

    def test_rejects_malformed(self):
        from gravitydb_spark.multimodal import decode_wav

        good = _hand_wav(self.SAMPLES)
        with pytest.raises(ValueError):
            decode_wav(b"RIFX" + good[4:])  # bad magic
        with pytest.raises(ValueError):
            decode_wav(good[:10])  # truncated
        bad_bits = bytearray(good)
        struct.pack_into("<H", bad_bits, 34, 8)  # 8-bit PCM unsupported
        with pytest.raises(ValueError):
            decode_wav(bytes(bad_bits))
        # fmt-only file (no data chunk)
        with pytest.raises(ValueError):
            decode_wav(good[: 12 + 8 + 16])

    def test_encoder_contract(self):
        from gravitydb_spark.multimodal import decode_wav, encode_wav, wav_file_size

        data = encode_wav(2, 24000, 5, seed=65530)
        assert len(data) == wav_file_size(2, 5)
        wav = decode_wav(data)
        assert wav["n_frames"] == 5 and wav["n_channels"] == 2
        # flat sample i = ((seed + 7i) % 65536) - 32768, crossing the wrap
        assert list(wav["samples"]) == [
            ((65530 + 7 * i) % 65536) - 32768 for i in range(10)
        ]


class TestAudioOperators:
    def test_audio_meta_parses_real_bytes(self, spark, sf_dir):
        from gravitydb_spark.multimodal import wav_file_size
        from gravitydb_spark.pipeline_queries import multimodal_audio_meta

        rows = {r["doc_id"]: r for r in multimodal_audio_meta(spark, sf_dir).collect()}
        assert rows
        d = min(rows)
        ch, rate, frames = 1 + d % 2, 8000 * (1 + d % 3), 50 + d % 150
        assert rows[d]["n_bytes"] == wav_file_size(ch, frames)
        assert rows[d]["audio_sig"] == f"{ch:02x}{rate:08x}10"

    def test_audio_energy_window_count(self, spark, sf_dir):
        from gravitydb_spark.pipeline_queries import AUDIO_WIN, multimodal_audio_energy

        counts = {
            r["doc_id"]: r["count"]
            for r in multimodal_audio_energy(spark, sf_dir)
            .groupBy("doc_id")
            .count()
            .collect()
        }
        assert counts
        for d, n in list(counts.items())[:20]:
            ch, frames = 1 + d % 2, 50 + d % 150
            assert n == (frames * ch) // AUDIO_WIN


def test_phash_kernel_separates_bright_and_dark_halves():
    """A crafted image with a dark top half and bright bottom half must
    hash to exactly the bottom-row bits — pinning both the grid sampling
    and the decoder's bottom-up un-flip (an un-flip bug inverts the
    hash)."""
    from gravitydb_spark.multimodal import decode_bmp, row_size, HEADER_SIZE
    import struct

    w, h = 8, 6
    rsize = row_size(w)
    header = struct.pack("<2sIHHI", b"BM", HEADER_SIZE + rsize * h, 0, 0, HEADER_SIZE)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, rsize * h, 2835, 2835, 0, 0)
    rows_topdown = [bytes([0] * (3 * w)) if y < h // 2 else bytes([200] * (3 * w))
                    for y in range(h)]
    pad = bytes(rsize - 3 * w)
    payload = header + dib + b"".join(r + pad for r in rows_topdown[::-1])  # bottom-up
    img = decode_bmp(payload)
    arr = b"".join(img["rows"])
    total3, npix = img["pixel_sum"], w * h
    phash = 0
    for y in range(3):
        for x in range(4):
            p = (y * h // 3) * w + (x * w // 4)
            g3 = arr[3 * p] + arr[3 * p + 1] + arr[3 * p + 2]
            if g3 * npix > total3:
                phash |= 1 << (y * 4 + x)
    # grid rows y=0 (img row 0) and y=1 (img row 2) sample the dark half;
    # y=2 (img row 4) samples the bright half -> bits 8..11 only
    assert phash == 0b111100000000
