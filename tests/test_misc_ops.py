"""assert/sample/load ops, sinks, http scan, extra introspection."""

import json
import threading

import pytest
from pyspark.sql import functions as F

from zed_spark import errors as E
from zed_spark.functions.introspect import fields_of, parse_zson, under
from zed_spark.operators.misc_ops import assert_op, sample_op
from zed_spark.sources.sinks import emit_split_by, to_table_string, write_any


def test_assert_marks_failures(spark):
    df = spark.createDataFrame([(1,), (20,)], "x int")
    out = assert_op(df, F.col("x") < 10, "x < 10")
    bad = out.filter(E.has_error(out))
    assert bad.count() == 1 and bad.first()["x"] == 20


def test_sample_per_shape(spark):
    a = spark.createDataFrame([(1, "s")], "x int, s string")
    b = spark.createDataFrame([(2.0, True)], "x double, b boolean")
    out = sample_op([a, b])
    assert out.count() == 2
    assert set(out.columns) == {"x", "s", "b"}


def test_sinks_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, tag string")
    for fmt in ["parquet", "json", "csv"]:
        p = str(tmp_path / fmt)
        write_any(df, p, fmt=fmt)
        back = (
            spark.read.options(header=True, inferSchema=True).format(fmt).load(p)
        )
        assert back.count() == 2
    assert "id" in to_table_string(df)


def test_emit_split_by(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, tag string")
    p = str(tmp_path / "split")
    emit_split_by(df, p, "tag")
    import os

    assert sorted(d for d in os.listdir(p) if d.startswith("tag=")) == ["tag=a", "tag=b"]


def test_http_scan(spark):
    from http.server import BaseHTTPRequestHandler, HTTPServer

    payload = b'{"a": 1}\n{"a": 2}\n'

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from zed_spark.sources.http import http_scan

        df = http_scan(spark, f"http://127.0.0.1:{srv.server_port}/data")
        assert sorted(r.a for r in df.collect()) == [1, 2]
    finally:
        srv.shutdown()


def test_multimodal_resize_and_audio_stubs(spark):
    from zed_spark.textops.multimodal import audio_features, resize_image

    df = spark.createDataFrame([(1, b"abcdef" * 100)], "doc_id long, media binary")
    r = resize_image(df, 8, 8, fake=True).first()
    assert len(r["resized"]) == 8 * 8 * 3 and r["width"] == 8
    a = audio_features(df, fake=True).first()
    assert a["duration_s"] > 0 and a["rms"] > 0
    # real path on non-image/non-audio payloads: null features, not a
    # crash (errors are values in this engine)
    r = resize_image(df, 8, 8).first()
    assert r["resized"] is None and r["width"] == 8
    a = audio_features(df).first()
    assert a["duration_s"] is None and a["rms"] is None


def test_resize_real_png(spark):
    """resize_image is REAL for PNG without any library: pure-Python
    pixel decode + nearest-neighbor resampling to raw RGB bytes. With
    PIL installed the same call routes through PIL for every format
    it knows (optional, probed at call time)."""
    from zed_spark.textops.multimodal import _real_resize, png_bytes, resize_image

    df = spark.createDataFrame(
        [(1, bytearray(png_bytes(16, 8, fill=77))), (2, b"notimage")],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in resize_image(df, 4, 4).collect()}
    assert got[1]["resized"] == bytes([77]) * (4 * 4 * 3)  # real pixels
    assert got[2]["resized"] is None
    # gray input replicates to 3 channels; upscale works too
    assert _real_resize(png_bytes(2, 2, color_type=0, fill=9), 5, 3) == (
        bytes([9]) * (5 * 3 * 3)
    )
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        return  # PIL branch covered only where PIL exists
    assert len(_real_resize(png_bytes(6, 6, fill=10), 3, 3)) == 27


def test_png_pixel_decode_real(spark):
    """Pixel decode is REAL for PNG: zlib inflate + spec unfiltering
    recover the actual pixel values — mean luma of a fill-valued
    image is exactly fill/255, and dims match the container."""
    import pytest as _pytest

    np = _pytest.importorskip("numpy")
    from zed_spark.textops.multimodal import decode_image, png_bytes, png_pixels

    px = png_pixels(png_bytes(7, 5, fill=200))
    assert px.shape == (5, 7, 3) and int(px[0, 0, 0]) == 200
    # filter-2 (Up) and filter-1 (Sub) rows via a real encoder check:
    # gray + alpha color types decode too
    assert png_pixels(png_bytes(4, 3, color_type=0, fill=10)).shape == (3, 4, 1)
    assert png_pixels(png_bytes(4, 3, color_type=6, fill=10)).shape == (3, 4, 4)
    # undecodable: junk and truncated → None, never raise
    assert png_pixels(b"junk") is None
    assert png_pixels(png_bytes(9, 9)[:30]) is None

    df = spark.createDataFrame(
        [(1, bytearray(png_bytes(16, 8, fill=51))), (2, b"notimage")],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (16, 8, 3)
    assert abs(got[1]["mean_luma"] - 51 / 255) < 1e-6
    assert got[2]["mean_luma"] is None  # undecodable → nulls


def test_wav_sample_decode_real(spark):
    """Sample decode is REAL for WAV integer PCM: numpy parse of the
    RIFF data chunk recovers amplitudes — a full-scale square wave
    has RMS 1.0 and one zero crossing per half period."""
    import struct as _struct

    from zed_spark.textops.multimodal import audio_features, wav_bytes, wav_samples

    # 16-bit mono square wave: 100 samples +16384, 100 samples -16384
    pcm = _struct.pack("<100h", *([16384] * 100)) + _struct.pack(
        "<100h", *([-16384] * 100)
    )
    wav = wav_bytes(n_channels=1, sample_rate=8000, bits=16, pcm=pcm)
    x, rate = wav_samples(wav)
    assert rate == 8000 and x.shape == (200, 1)
    assert abs(float(x[0, 0]) - 0.5) < 1e-9

    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, media binary")
    a = audio_features(df).first()
    assert abs(a["duration_s"] - 200 / 8000) < 1e-9
    assert abs(a["rms"] - 0.5) < 1e-9
    assert a["zero_crossings"] == 1


def test_image_header_parse_real_formats(spark):
    """Header decode is REAL: dims come out of actual PNG/JPEG/GIF
    container bytes (public specs), no image library involved."""
    from zed_spark.textops.multimodal import image_meta, parse_image_header, png_bytes

    # real PNG from the synthesizer
    assert parse_image_header(png_bytes(33, 21)) == ("png", 33, 21, 3)
    assert parse_image_header(png_bytes(5, 9, color_type=6)) == ("png", 5, 9, 4)
    # handcrafted minimal JPEG: SOI + APP0 + SOF0(h=7,w=11,3ch) + EOI
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 7, 11, 3) + b"\x00" * 9
    jpeg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert parse_image_header(jpeg) == ("jpeg", 11, 7, 3)
    # GIF fixed header
    assert parse_image_header(b"GIF89a" + struct.pack("<HH", 40, 30) + b"\x00" * 4) == (
        "gif", 40, 30, 3)
    # junk and truncation degrade, never raise
    assert parse_image_header(b"notanimage")[0] == "unknown"
    assert parse_image_header(png_bytes(9, 9)[:20])[0] == "unknown"
    assert parse_image_header(None)[0] == "unknown"

    # distributed: mapInPandas round-trip over a binary column
    df = spark.createDataFrame(
        [(1, bytearray(png_bytes(20, 10))), (2, bytearray(jpeg)), (3, b"junk" * 4)],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in image_meta(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 20, 10)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 11, 7)
    assert got[3]["format"] == "unknown" and got[3]["width"] is None


def test_audio_video_header_parse_real_formats(spark):
    """WAV and MP4 metadata decode is REAL byte parsing of the public
    container specs — no media library involved."""
    from zed_spark.textops.multimodal import (
        audio_meta,
        mp4_bytes,
        parse_audio_header,
        parse_video_header,
        video_meta,
        wav_bytes,
    )

    wav = wav_bytes(n_channels=2, sample_rate=44100, bits=16, n_samples=44100)
    assert parse_audio_header(wav) == ("wav", 2, 44100, 16, 1.0)
    mono = wav_bytes(n_channels=1, sample_rate=16000, bits=8, n_samples=8000)
    assert parse_audio_header(mono) == ("wav", 1, 16000, 8, 0.5)
    assert parse_audio_header(b"RIFFjunk")[0] == "unknown"
    assert parse_audio_header(None)[0] == "unknown"

    mp4 = mp4_bytes(duration_s=2.5, timescale=1000, width=1280, height=720)
    assert parse_video_header(mp4) == ("mp4", "isom", 2.5, 1280, 720)
    assert parse_video_header(b"\x00\x00\x00\x08free")[0] == "unknown"
    assert parse_video_header(None)[0] == "unknown"

    # distributed: mapInPandas over binary columns
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, b"junk" * 4)], "doc_id long, media binary"
    )
    got = {r["doc_id"]: r for r in audio_meta(df).collect()}
    assert (got[1]["n_channels"], got[1]["sample_rate"]) == (2, 44100)
    assert got[2]["format"] == "unknown"
    vdf = spark.createDataFrame([(1, bytearray(mp4))], "doc_id long, media binary")
    v = video_meta(vdf).first()
    assert (v["brand"], v["width"], v["height"], v["duration_s"]) == (
        "isom", 1280, 720, 2.5,
    )


def test_fields_of_and_under(spark):
    df = spark.createDataFrame([((1, "x"),)], "r struct<a:int, b:string>")
    row = df.select(fields_of(df, "r").alias("f"), under(F.col("r")).alias("u")).first()
    assert row["f"] == [["a"], ["b"]]
    assert row["u"]["a"] == 1


def test_parse_zson_json_analog(spark):
    df = spark.createDataFrame([('{"x": 5}',)], "s string")
    out = df.select(parse_zson(spark, F.col("s"), "x INT").alias("v"))
    assert out.first()["v"]["x"] == 5


def test_ksuid_codec(spark):
    """Real KSUID base62 codec (public format: 20 bytes <-> 27-char
    base62; reference runtime/sam/expr/function/ksuid.go)."""
    from zed_spark.functions.misc import (
        ksuid_decode_str,
        ksuid_encode_bytes,
        ksuid_parse,
        ksuid_to_string,
    )

    # the segmentio/ksuid README example pair
    raw = bytes.fromhex("0669F7EFB5A1CD34B5F99D1154FB6853345C9735")
    assert ksuid_encode_bytes(raw) == "0ujtsYcgvSTl8PAuAdqWYSMnLOv"
    assert ksuid_decode_str("0ujtsYcgvSTl8PAuAdqWYSMnLOv") == raw
    # round-trip arbitrary payloads
    for payload in (b"\x00" * 20, b"\xff" * 20, bytes(range(20))):
        assert ksuid_decode_str(ksuid_encode_bytes(payload)) == payload

    df = spark.createDataFrame([(1, raw), (2, None)], "id long, k binary")
    got = {r["id"]: r["s"] for r in df.select("id", ksuid_to_string(F.col("k")).alias("s")).collect()}
    assert got[1] == "0ujtsYcgvSTl8PAuAdqWYSMnLOv" and got[2] is None
    back = df.select(ksuid_parse(ksuid_to_string(F.col("k"))).alias("b")).first()
    assert bytes(back["b"]) == raw

    # language dispatch: string arg decodes, binary arg encodes
    from zed_spark.session import ZedSession

    z = ZedSession(spark)
    out = z.query("from t | yield {s: ksuid(k)}", tables={"t": df.limit(1)}).df
    assert out.first()["s"] == "0ujtsYcgvSTl8PAuAdqWYSMnLOv"


def test_hll_sketch_reference_exact():
    """The dcount sketch is a bit-faithful port (agg/dcount.go:
    metro hash seed 1337 over AppendInt(type id)+bytes, p=14
    LogLog-Beta): `seq 10000` estimates EXACTLY the reference's
    documented 9987 (aggregates/dcount.md)."""
    from zed_spark.functions.hll import (
        dcount_datum,
        estimate,
        insert,
        merge,
        metro64,
        new_registers,
    )

    # MetroHash64 published 63-byte test vector (bytes little-endian)
    key = b"012345678901234567890123456789012345678901234567890123456789012"
    assert metro64(key, 0).to_bytes(8, "little").hex() == "6b753dae06704bad"

    regs = new_registers()
    d = ("prim", "int64")
    for v in range(1, 10001):
        insert(regs, dcount_datum(v, d))
    assert estimate(regs) == 9987

    # partial merge is the register max (sketch Merge): splitting the
    # stream across two sketches estimates identically
    a, b = new_registers(), new_registers()
    for v in range(1, 5001):
        insert(a, dcount_datum(v, d))
    for v in range(5001, 10001):
        insert(b, dcount_datum(v, d))
    merge(a, bytes(b))
    assert estimate(a) == 9987


def test_dcount_distinct_types_equal_bodies_do_not_collide():
    """{a:1} and [1] share ZNG body bytes; the type tag must keep
    them distinct (agg/dcount.go feeds the context type id). Complex
    types ride the canonical rendered type string — deterministic
    across sketch partials, injective per type."""
    from zed_spark.functions.hll import (
        dcount_datum,
        estimate,
        insert,
        new_registers,
    )

    d_rec = ("record", [("a", ("prim", "int64"))])
    d_arr = ("array", ("prim", "int64"))
    d_rec2 = ("record", [("b", ("prim", "int64"))])
    a = dcount_datum({"a": 1}, d_rec)
    b = dcount_datum([1], d_arr)
    c = dcount_datum({"b": 1}, d_rec2)
    assert len({a, b, c}) == 3
    regs = new_registers()
    for x in (a, b, c):
        insert(regs, x)
    assert estimate(regs) == 3


def test_bmp_gif_pixel_decode_real(spark):
    """BMP and GIF pixel decode are REAL without any library: BI_RGB
    row parsing and spec LZW decompression (GIF89a appendix F). The
    LZW vector below exercises the KwKwK growth case with codes the
    repo's own encoder never produces (it CLEARs per pixel), so the
    decoder is checked against the spec, not against itself."""
    from zed_spark.textops.multimodal import (
        _gif_lzw_decode,
        bmp_bytes,
        bmp_pixels,
        decode_image,
        gif_bytes,
        gif_pixels,
        resize_image,
    )

    assert bmp_pixels(bmp_bytes(5, 3, fill=77)).shape == (3, 5, 3)
    assert int(gif_pixels(gif_bytes(4, 2, fill=200))[1, 3, 0]) == 200

    # hand-packed 9-bit LSB-first stream: CLEAR(256), 1, 258, END(257)
    # decodes to pixels [1,1,1] via the code==len(table) (KwKwK) rule
    codes = [256, 1, 258, 257]
    buf = bits = 0
    data = bytearray()
    for c in codes:
        buf |= c << bits
        bits += 9
        while bits >= 8:
            data.append(buf & 0xFF)
            buf >>= 8
            bits -= 8
    if bits:
        data.append(buf & 0xFF)
    assert _gif_lzw_decode(bytes(data), 8, 3) == [1, 1, 1]

    # the Spark path decodes mixed containers in one pass; junk -> nulls
    df = spark.createDataFrame(
        [
            (1, bytearray(bmp_bytes(8, 4, fill=10))),
            (2, bytearray(gif_bytes(6, 6, fill=99))),
            (3, b"not an image"),
        ],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (8, 4)
    assert abs(got[1]["mean_luma"] - 10 / 255) < 1e-6
    assert (got[2]["width"], got[2]["height"]) == (6, 6)
    assert got[3]["width"] is None
    rz = {r["doc_id"]: r for r in resize_image(df, 2, 2).collect()}
    assert rz[2]["resized"] == bytes([99]) * 12
    assert rz[3]["resized"] is None


def _jpeg_test_emitter():
    """Independent in-test JPEG bit emitter (MSB-first, 0xFF00
    stuffing, 1-padded tail) — deliberately NOT the repo's
    jpeg_bytes encoder, so decoder tests don't lean on a matching
    implementation (the zigzag lesson)."""
    state = {"acc": 0, "n": 0}
    out = bytearray()

    def put(val, nbits):
        for i in range(nbits - 1, -1, -1):
            state["acc"] = (state["acc"] << 1) | ((val >> i) & 1)
            state["n"] += 1
            if state["n"] == 8:
                out.append(state["acc"])
                if state["acc"] == 0xFF:
                    out.append(0x00)
                state["acc"] = state["n"] = 0

    def flush():
        while state["n"]:
            put(1, 1)
        return bytes(out)

    return put, flush, out


def _jpeg_test_codes(bits, vals):
    """symbol -> (nbits, code), canonical per T.81 Annex C —
    re-derived in-test."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_naive_idct(S):
    """Direct T.81 A.3.3 double-sum IDCT (independent of the repo's
    basis-matrix implementation): s(y,x) = sum_u sum_v C(u)C(v)/4
    S[v][u] cos((2x+1)u pi/16) cos((2y+1)v pi/16)."""
    import math

    out = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv / 4 * S[v][u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[y][x] = acc + 128.0
    return out


def test_jpeg_baseline_decode_spec_vector():
    """Baseline JPEG decode is REAL: a hand-assembled single-block
    grayscale file (unit quant table, Annex K.3 Huffman tables, DC +
    two AC coefficients incl. a zero run) must decode to the pixels
    the spec's own double-sum IDCT produces. The file bytes and the
    expected pixels are both built independently of the repo's
    encoder and decoder."""
    import struct

    import numpy as np

    from zed_spark.textops.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        jpeg_pixels,
    )

    dc = _jpeg_test_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac = _jpeg_test_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    put, flush, _ = _jpeg_test_emitter()
    # DC = 16 (category 5, bits 10000)
    put(dc[5][1], dc[5][0])
    put(16, 5)
    # AC zigzag 1 = S[0][1] = 12: run 0 size 4 -> symbol 0x04
    put(ac[0x04][1], ac[0x04][0])
    put(12, 4)
    # skip 3 zeros, AC zigzag 5 = S[0][2] = -7: run 3 size 3 -> 0x33,
    # magnitude bits are the one's complement form -7 -> 0
    put(ac[0x33][1], ac[0x33][0])
    put(0, 3)
    # EOB
    put(ac[0x00][1], ac[0x00][0])
    scan = flush()

    f = bytearray(b"\xff\xd8")
    f += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    f += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    f += bytes([1, 0x11, 0])
    f += b"\xff\xc4" + struct.pack(">HB", 31, 0x00) + _JPEG_DC_BITS + _JPEG_DC_VALS
    f += b"\xff\xc4" + struct.pack(">HB", 181, 0x10) + _JPEG_AC_BITS + _JPEG_AC_VALS
    f += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    f += scan + b"\xff\xd9"

    S = [[0] * 8 for _ in range(8)]
    S[0][0], S[0][1], S[0][2] = 16, 12, -7
    want = np.clip(np.rint(np.array(_jpeg_naive_idct(S))), 0, 255).astype(np.uint8)
    got = jpeg_pixels(bytes(f))
    assert got is not None and got.shape == (8, 8, 1)
    assert np.array_equal(got[..., 0], want), (got[..., 0], want)


def test_jpeg_color_420_restart_markers():
    """A hand-assembled 3-component 4:2:0 JPEG (two MCUs, DRI=1, an
    RST0 between them that must reset the DC predictors) decodes to
    the RGB the JFIF YCbCr equations give — computed independently
    here."""
    import struct

    import numpy as np

    from zed_spark.textops.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        jpeg_pixels,
    )

    Y, CB, CR = 90, 60, 190
    dc = _jpeg_test_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac = _jpeg_test_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    def block(put, diff):
        t = abs(diff).bit_length()
        put(dc[t][1], dc[t][0])
        if t:
            put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        put(ac[0x00][1], ac[0x00][0])

    def mcu_bytes():
        # 4 Y blocks + Cb + Cr; solid plane -> only the first DC of
        # each component is nonzero (predictors reset per restart)
        put, flush, _ = _jpeg_test_emitter()
        for i in range(4):
            block(put, (Y - 128) if i == 0 else 0)
        block(put, CB - 128)
        block(put, CR - 128)
        return flush()

    qtab = bytes([8] + [16] * 63)  # Q[0]=8 -> DC is exact
    f = bytearray(b"\xff\xd8")
    f += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qtab
    f += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 32, 3)
    f += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    f += bytes([2, 0x11, 0])  # Cb: 1x1
    f += bytes([3, 0x11, 0])  # Cr: 1x1
    f += b"\xff\xc4" + struct.pack(">HB", 31, 0x00) + _JPEG_DC_BITS + _JPEG_DC_VALS
    f += b"\xff\xc4" + struct.pack(">HB", 181, 0x10) + _JPEG_AC_BITS + _JPEG_AC_VALS
    f += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI: restart every MCU
    f += b"\xff\xda" + struct.pack(">HB", 12, 3)
    f += bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    f += mcu_bytes() + b"\xff\xd0" + mcu_bytes() + b"\xff\xd9"

    got = jpeg_pixels(bytes(f))
    assert got is not None and got.shape == (16, 32, 3)
    cb, cr = CB - 128.0, CR - 128.0
    want = [
        int(np.clip(round(v), 0, 255))
        for v in (
            Y + 1.402 * cr,
            Y - 0.344136 * cb - 0.714136 * cr,
            Y + 1.772 * cb,
        )
    ]
    assert got.min(axis=(0, 1)).tolist() == want
    assert got.max(axis=(0, 1)).tolist() == want

    # progressive (SOF2) and truncated scans degrade to None, no raise
    prog = bytes(f).replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert jpeg_pixels(prog) is None
    assert jpeg_pixels(bytes(f)[:80]) is None


def _jpeg_test_tables():
    import struct

    from zed_spark.textops.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
    )

    dht = b"\xff\xc4" + struct.pack(">HB", 31, 0x00) + _JPEG_DC_BITS + _JPEG_DC_VALS
    dht += b"\xff\xc4" + struct.pack(">HB", 181, 0x10) + _JPEG_AC_BITS + _JPEG_AC_VALS
    dc = _jpeg_test_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac = _jpeg_test_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    return dht, dc, ac


def _jpeg_prog_ac_table():
    """A custom AC Huffman table with the EOBn symbols progressive
    scans need (Annex K's sequential table has only EOB0/ZRL —
    progressive encoders always emit custom tables). Canonical codes:
    L2: 0x00, 0x01; L3: 0x10, 0x20."""
    import struct

    bits = bytes([0, 2, 2] + [0] * 13)
    vals = bytes([0x00, 0x01, 0x10, 0x20])
    seg = b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 4, 0x10) + bits + vals
    return seg, _jpeg_test_codes(bits, vals)


def _jpeg_sos(comps, ss, se, ah, al):
    """SOS segment: comps = [(cid, td, ta)]."""
    import struct

    ns = len(comps)
    seg = bytes([ns])
    for cid, td, ta in comps:
        seg += bytes([cid, (td << 4) | ta])
    seg += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg


def _put_dc_diff(put, dc, diff):
    t = abs(diff).bit_length()
    put(dc[t][1], dc[t][0])
    if t:
        put(diff if diff >= 0 else diff + (1 << t) - 1, t)


def test_jpeg_progressive_gray_successive_approximation():
    """A hand-assembled progressive (SOF2) grayscale file — DC first
    at Al=1, all-zero AC band via a 2-block EOB run, DC refinement —
    must reconstruct the exact solid fill. Every scan's bitstream is
    built by the independent in-test emitter per T.81 Annex G."""
    import struct

    import numpy as np

    from zed_spark.textops.multimodal import jpeg_pixels

    dht, dc, ac = _jpeg_test_tables()
    ac_seg, ac = _jpeg_prog_ac_table()  # EOBn symbols (custom table)
    qtab = bytes([8] + [16] * 63)
    FILL = 150  # quantized DC = (150-128)*8/8 = 22; 22>>1 = 11, LSB 0

    f = bytearray(b"\xff\xd8")
    f += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qtab
    f += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 16, 1) + bytes([1, 0x11, 0])
    f += dht + ac_seg
    # scan 1: DC first, Al=1 — diffs 11 then 0 (reduced precision)
    put, flush, _ = _jpeg_test_emitter()
    _put_dc_diff(put, dc, 11)
    _put_dc_diff(put, dc, 0)
    f += _jpeg_sos([(1, 0, 0)], 0, 0, 0, 1) + flush()
    # scan 2: AC first, band 1-63 — one EOB run covering both blocks
    put, flush, _ = _jpeg_test_emitter()
    put(ac[0x10][1], ac[0x10][0])  # EOB1: run = 2 + extra bit
    put(0, 1)
    f += _jpeg_sos([(1, 0, 0)], 1, 63, 0, 0) + flush()
    # scan 3: DC refinement Ah=1, Al=0 — LSB of 22 is 0, both blocks
    put, flush, _ = _jpeg_test_emitter()
    put(0, 1)
    put(0, 1)
    f += _jpeg_sos([(1, 0, 0)], 0, 0, 1, 0) + flush()
    f += b"\xff\xd9"

    got = jpeg_pixels(bytes(f))
    assert got is not None and got.shape == (8, 16, 1)
    assert int(got.min()) == int(got.max()) == FILL


def test_jpeg_progressive_ac_refinement_correction_bits():
    """AC successive approximation end to end: an AC coefficient
    placed at reduced precision in the first scan gains its
    correction bit in the refinement scan (the EOB-run branch must
    refine the remaining band of the CURRENT block — the formula
    differs from first scans). Expected pixels from the in-test
    double-sum IDCT."""
    import struct

    import numpy as np

    from zed_spark.textops.multimodal import jpeg_pixels

    dht, dc, ac = _jpeg_test_tables()
    f = bytearray(b"\xff\xd8")
    f += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    f += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    f += dht
    # true quantized coefs: DC = 16, AC at zigzag 1 = 3
    # scan 1: DC first Al=1 -> diff 8, stored 16
    put, flush, _ = _jpeg_test_emitter()
    _put_dc_diff(put, dc, 8)
    f += _jpeg_sos([(1, 0, 0)], 0, 0, 0, 1) + flush()
    # scan 2: AC first Al=1 -> 3>>1 = 1 at k=1 (run 0 size 1, bit 1),
    # then EOB
    put, flush, _ = _jpeg_test_emitter()
    put(ac[0x01][1], ac[0x01][0])
    put(1, 1)
    put(ac[0x00][1], ac[0x00][0])
    f += _jpeg_sos([(1, 0, 0)], 1, 63, 0, 1) + flush()
    # scan 3: DC refine Al=0 -> LSB of 16 is 0
    put, flush, _ = _jpeg_test_emitter()
    put(0, 1)
    f += _jpeg_sos([(1, 0, 0)], 0, 0, 1, 0) + flush()
    # scan 4: AC refine Al=0 -> no new coefs: EOB(run 1), then the
    # correction bit for k=1 (3 has LSB 1)
    put, flush, _ = _jpeg_test_emitter()
    put(ac[0x00][1], ac[0x00][0])
    put(1, 1)
    f += _jpeg_sos([(1, 0, 0)], 1, 63, 1, 0) + flush()
    f += b"\xff\xd9"

    S = [[0] * 8 for _ in range(8)]
    S[0][0], S[0][1] = 16, 3
    want = np.clip(np.rint(np.array(_jpeg_naive_idct(S))), 0, 255).astype(np.uint8)
    got = jpeg_pixels(bytes(f))
    assert got is not None and got.shape == (8, 8, 1)
    assert np.array_equal(got[..., 0], want), (got[..., 0], want)


def test_jpeg_progressive_color_interleaved_dc():
    """Progressive color 4:2:0: one interleaved DC scan (all three
    components, per-component predictors) + per-component all-zero AC
    scans with multi-block EOB runs reconstructs the exact solid
    YCbCr color."""
    import struct

    import numpy as np

    from zed_spark.textops.multimodal import jpeg_pixels

    dht, dc, ac = _jpeg_test_tables()
    ac_seg, ac = _jpeg_prog_ac_table()  # EOBn symbols (custom table)
    Y, CB, CR = 90, 60, 190
    qtab = bytes([8] + [16] * 63)
    f = bytearray(b"\xff\xd8")
    f += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qtab
    f += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    f += bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    f += dht + ac_seg
    # interleaved DC-first scan (Al=0): MCU = 4 Y blocks + Cb + Cr
    put, flush, _ = _jpeg_test_emitter()
    for i in range(4):
        _put_dc_diff(put, dc, (Y - 128) if i == 0 else 0)
    _put_dc_diff(put, dc, CB - 128)
    _put_dc_diff(put, dc, CR - 128)
    f += _jpeg_sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 0) + flush()
    # AC-first scans, all zero: Y has 4 blocks (EOB2 + 2 extra-bit
    # zeros -> run of 4), Cb/Cr one block each (EOB0)
    put, flush, _ = _jpeg_test_emitter()
    put(ac[0x20][1], ac[0x20][0])
    put(0, 2)
    f += _jpeg_sos([(1, 0, 0)], 1, 63, 0, 0) + flush()
    for cid in (2, 3):
        put, flush, _ = _jpeg_test_emitter()
        put(ac[0x00][1], ac[0x00][0])
        f += _jpeg_sos([(cid, 0, 0)], 1, 63, 0, 0) + flush()
    f += b"\xff\xd9"

    got = jpeg_pixels(bytes(f))
    assert got is not None and got.shape == (16, 16, 3)
    cb, cr = CB - 128.0, CR - 128.0
    want = [
        int(np.clip(round(v), 0, 255))
        for v in (
            Y + 1.402 * cr,
            Y - 0.344136 * cb - 0.714136 * cr,
            Y + 1.772 * cb,
        )
    ]
    assert got.min(axis=(0, 1)).tolist() == want
    assert got.max(axis=(0, 1)).tolist() == want


def test_jpeg_spark_decode_and_resize(spark):
    """JPEGs flow through the Spark decode/resize path like every
    other container — no PIL in this environment, so this exercises
    the pure-Python baseline path end to end."""
    from zed_spark.textops.multimodal import (
        any_pixels,
        decode_image,
        jpeg_bytes,
        resize_image,
    )

    jb = jpeg_bytes(16, 10, fill=77)
    assert any_pixels(jb).shape == (10, 16, 1)
    df = spark.createDataFrame(
        [(1, bytearray(jb)), (2, b"\xff\xd8junk")],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (16, 10, 1)
    assert abs(got[1]["mean_luma"] - 77 / 255) < 1e-6
    assert got[2]["width"] is None
    rz = {r["doc_id"]: r for r in resize_image(df, 4, 4).collect()}
    assert rz[1]["resized"] == bytes([77]) * 48
    assert rz[2]["resized"] is None


def test_png_palette_decode_real():
    """Palette PNGs (color type 3) decode for real: PLTE lookup maps
    indices to RGB."""
    from zed_spark.textops.multimodal import png_bytes, png_pixels

    px = png_pixels(png_bytes(6, 4, color_type=3, fill=123))
    assert px.shape == (4, 6, 3) and int(px[0, 0, 0]) == 123
    # palette PNG without a PLTE chunk degrades to None, never raises
    import re

    broken = png_bytes(2, 2, color_type=3)
    broken = broken.replace(b"PLTE", b"XXXX", 1)
    assert png_pixels(broken) is None


def test_audio_header_flac_mp3(spark):
    """FLAC STREAMINFO and MP3 frame-header parsing are REAL: fields
    come out of genuine container bytes (public specs), including a
    hand-packed STREAMINFO the repo synthesizer cross-checks."""
    from zed_spark.textops.multimodal import (
        audio_meta,
        flac_bytes,
        mp3_bytes,
        parse_audio_header,
        wav_bytes,
    )

    got = parse_audio_header(flac_bytes(1, 48000, 24, 96000))
    assert got == ("flac", 1, 48000, 24, 2.0)
    # hand-packed STREAMINFO, independent of the synthesizer: 44100 Hz
    # stereo 16-bit, 44100 samples -> 1 s
    packed = (44100 << 44) | (1 << 41) | (15 << 36) | 44100
    info = b"\x10\x00\x10\x00" + b"\x00" * 6 + packed.to_bytes(8, "big") + b"\x00" * 16
    f = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info
    assert parse_audio_header(f) == ("flac", 2, 44100, 16, 1.0)

    mp3 = mp3_bytes(n_frames=38, kbps=128, sample_rate=44100)
    fmt, nch, rate, bits, dur = parse_audio_header(mp3)
    assert (fmt, nch, rate, bits) == ("mp3", 2, 44100, None)
    # 38 frames x 417 bytes at 128 kbps ~= 0.99 s
    assert abs(dur - (len(mp3) - 10) * 8 / 128000) < 1e-6
    assert parse_audio_header(mp3_bytes(mono=True))[1] == 1
    # truncated/garbage degrade, never raise
    assert parse_audio_header(b"fLaC\x00\x22")[0] == "unknown"
    assert parse_audio_header(b"ID3\x03\x00\x00\x00\x00\x00\x00\xff")[0] == "unknown"

    df = spark.createDataFrame(
        [
            (1, bytearray(flac_bytes(2, 44100, 16, 22050))),
            (2, bytearray(mp3_bytes())),
            (3, bytearray(wav_bytes())),
        ],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in audio_meta(df).collect()}
    assert got[1]["format"] == "flac" and got[1]["duration_s"] == 0.5
    assert got[2]["format"] == "mp3" and got[2]["sample_rate"] == 44100
    assert got[3]["format"] == "wav"


def test_image_header_webp_tiff():
    """WEBP (all three chunk forms) and TIFF (both byte orders)
    header parsing from hand-built container bytes per the public
    specs."""
    import struct

    from zed_spark.textops.multimodal import parse_image_header

    def riff(tag, payload):
        body = b"WEBP" + tag + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # VP8 lossy: 3-byte frame tag + sync 9D 01 2A + 14-bit dims
    vp8 = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    assert parse_image_header(riff(b"VP8 ", vp8)) == ("webp", 320, 240, 3)
    # VP8L lossless: 0x2F then 14+14 bit w-1/h-1 (+alpha bit 28)
    bits = (99) | (49 << 14) | (1 << 28)
    vp8l = b"\x2f" + struct.pack("<I", bits)
    assert parse_image_header(riff(b"VP8L", vp8l)) == ("webp", 100, 50, 4)
    # VP8X extended: flags byte (0x10 = alpha), 24-bit w-1/h-1
    vp8x = bytes([0x10, 0, 0, 0]) + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    assert parse_image_header(riff(b"VP8X", vp8x)) == ("webp", 640, 480, 4)

    # TIFF little- and big-endian: tags 256/257/277
    def tiff(end):
        e = "<" if end == b"II*\x00" else ">"
        entries = [
            struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "H", 800) + b"\x00\x00",
            struct.pack(e + "HHI", 257, 4, 1) + struct.pack(e + "I", 600),
            struct.pack(e + "HHI", 277, 3, 1) + struct.pack(e + "H", 3) + b"\x00\x00",
        ]
        ifd = struct.pack(e + "H", len(entries)) + b"".join(entries) + b"\x00" * 4
        return end + struct.pack(e + "I", 8) + ifd

    assert parse_image_header(tiff(b"II*\x00")) == ("tiff", 800, 600, 3)
    assert parse_image_header(tiff(b"MM\x00*")) == ("tiff", 800, 600, 3)
    # truncated webp/tiff degrade to format-only / unknown, no raise
    assert parse_image_header(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == ("webp", None, None, None)
    assert parse_image_header(b"II*\x00\xff\xff\xff\xff\x00\x00")[:1] == ("tiff",)


def test_jpeg_decoder_never_raises():
    """Adversarial robustness: truncations and byte mutations of
    valid files, and random marker soup, must yield an array or None
    — never an exception (errors are values in this engine)."""
    import random

    from zed_spark.textops.multimodal import jpeg_bytes, jpeg_pixels

    rng = random.Random(7)
    base = jpeg_bytes(16, 16, fill=99)
    for cut in range(0, len(base), 7):
        out = jpeg_pixels(base[:cut])
        assert out is None or out.shape == (16, 16, 1)
    for _ in range(200):
        mut = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        out = jpeg_pixels(bytes(mut))
        assert out is None or out.ndim == 3
    for _ in range(100):
        soup = b"\xff\xd8" + bytes(
            rng.randrange(256) for _ in range(rng.randint(0, 120))
        )
        out = jpeg_pixels(soup)
        assert out is None or out.ndim == 3
    # progressive files get the same treatment: flip the baseline
    # SOF0 marker to SOF2 so the multi-scan machinery sees garbage
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    for _ in range(200):
        mut = bytearray(prog)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        out = jpeg_pixels(bytes(mut))
        assert out is None or out.ndim == 3


def test_jpeg_baseline_422_subsampling():
    """Baseline 4:2:2 (Y 2x1, chroma 1x1): horizontal-only chroma
    replication reconstructs the exact solid YCbCr color."""
    import struct

    import numpy as np

    from zed_spark.textops.multimodal import jpeg_pixels

    dht, dc, ac = _jpeg_test_tables()
    Y, CB, CR = 120, 100, 140
    qtab = bytes([8] + [16] * 63)
    f = bytearray(b"\xff\xd8")
    f += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qtab
    f += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 8, 16, 3)
    f += bytes([1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0])  # Y 2x1
    f += dht
    f += b"\xff\xda" + struct.pack(">HB", 12, 3)
    f += bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    put, flush, _ = _jpeg_test_emitter()

    def block(diff):
        t = abs(diff).bit_length()
        put(dc[t][1], dc[t][0])
        if t:
            put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        put(ac[0x00][1], ac[0x00][0])

    # one MCU: 2 Y blocks (2x1) + Cb + Cr
    block(Y - 128)
    block(0)
    block(CB - 128)
    block(CR - 128)
    f += flush() + b"\xff\xd9"

    got = jpeg_pixels(bytes(f))
    assert got is not None and got.shape == (8, 16, 3)
    cb, cr = CB - 128.0, CR - 128.0
    want = [
        int(np.clip(round(v), 0, 255))
        for v in (
            Y + 1.402 * cr,
            Y - 0.344136 * cb - 0.714136 * cr,
            Y + 1.772 * cb,
        )
    ]
    assert got.min(axis=(0, 1)).tolist() == want
    assert got.max(axis=(0, 1)).tolist() == want


def test_jpeg_pixel_count_gate():
    """A header claiming 65535x65535 returns None before any plane
    allocation (decode bound, mirrors the engine's gate convention)."""
    import struct

    from zed_spark.textops.multimodal import jpeg_bytes, jpeg_pixels

    big = bytearray(jpeg_bytes(8, 8))
    sof = big.find(b"\xff\xc0")
    big[sof + 5 : sof + 9] = struct.pack(">HH", 65535, 65535)
    assert jpeg_pixels(bytes(big)) is None


def test_gif_frames_and_disposal():
    """Animated GIF decode is REAL: every frame composites onto the
    canvas; disposal 2 restores the background between frames."""
    import numpy as np

    from zed_spark.textops.multimodal import gif_anim_bytes, gif_frames

    b = gif_anim_bytes(4, 3, [10, 200, 45])
    frames = list(gif_frames(b))
    assert [f for f, _ in frames] == [0, 1, 2]
    for (fno, px), fill in zip(frames, (10, 200, 45)):
        assert px.shape == (3, 4, 3)
        assert int(px.min()) == int(px.max()) == fill

    # disposal 2: a sub-rect frame then background restore — frame 2
    # must NOT retain frame 1's pixels outside its own rect
    import struct as _s

    full = gif_anim_bytes(4, 4, [7], disposal=2)
    # splice in a second full-canvas frame of 99 after the first
    second = gif_anim_bytes(4, 4, [99], disposal=1)
    # take second's GCE+image block (between the palette and trailer)
    start = 13 + 256 * 3
    block = second[start:-1]
    b2 = full[:-1] + block + b"\x3b"
    frames = list(gif_frames(b2))
    assert len(frames) == 2
    # frame 0 shows 7; after disposal-2 the canvas resets to the
    # background (index 0 -> black) before frame 1 paints 99
    assert int(frames[0][1].max()) == 7
    assert int(frames[1][1].min()) == int(frames[1][1].max()) == 99


def test_avi_mjpeg_frames_real(spark):
    """MJPEG AVI frame sampling end to end: container walk + the
    pure-Python JPEG decoder, through the Spark mapInPandas path."""
    import numpy as np

    from zed_spark.textops.multimodal import (
        avi_mjpeg_bytes,
        avi_mjpeg_frames,
        frame_sample,
        gif_anim_bytes,
        jpeg_bytes,
    )

    avi = avi_mjpeg_bytes([jpeg_bytes(8, 8, fill=f) for f in (30, 60, 90, 120)])
    frames = list(avi_mjpeg_frames(avi))
    assert [f for f, _ in frames] == [0, 1, 2, 3]
    assert all(int(px.min()) == int(px.max()) == f for (_, px), f in
               zip(frames, (30, 60, 90, 120)))

    df = spark.createDataFrame(
        [
            (1, bytearray(avi)),
            (2, bytearray(gif_anim_bytes(4, 2, [5, 6, 7]))),
            (3, b"not video"),
        ],
        "doc_id long, media binary",
    )
    got = frame_sample(df, every_n=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(r["frame_no"] for r in by_doc[1]) == [0, 2]
    f0 = next(r for r in by_doc[1] if r["frame_no"] == 0)
    assert (f0["width"], f0["height"]) == (8, 8)
    assert f0["frame"] == bytes([30]) * (8 * 8 * 3)
    assert sorted(r["frame_no"] for r in by_doc[2]) == [0, 2]
    g2 = next(r for r in by_doc[2] if r["frame_no"] == 2)
    assert g2["frame"] == bytes([7]) * (4 * 2 * 3)
    assert 3 not in by_doc  # undecodable: no rows, no crash


def test_frame_decoders_never_raise():
    """Fuzz regression for the container decoders: mutations caught a
    corrupt LZW min-code byte sizing the initial table at 1<<255 (a
    hard hang) and a zero JPEG sampling factor (ZeroDivisionError).
    Truncations and byte mutations must terminate quickly and never
    raise."""
    import random

    from zed_spark.textops.multimodal import (
        any_pixels,
        avi_mjpeg_bytes,
        avi_mjpeg_frames,
        bmp_bytes,
        gif_anim_bytes,
        gif_bytes,
        gif_frames,
        jpeg_bytes,
        png_bytes,
    )

    rng = random.Random(3)
    gif = gif_anim_bytes(6, 4, [1, 2, 3])
    avi = avi_mjpeg_bytes([jpeg_bytes(8, 8, fill=60)])
    for base, dec in ((gif, gif_frames), (avi, avi_mjpeg_frames)):
        for cut in range(0, len(base), 11):
            list(dec(base[:cut]))
        for _ in range(300):
            mut = bytearray(base)
            for _ in range(rng.randint(1, 5)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            list(dec(bytes(mut)))
    for base in (gif_bytes(5, 4, fill=9), png_bytes(5, 4), bmp_bytes(5, 4)):
        for cut in range(0, len(base), 13):
            any_pixels(base[:cut])
        for _ in range(200):
            mut = bytearray(base)
            for _ in range(rng.randint(1, 5)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            any_pixels(bytes(mut))


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", _z.crc32(tag + data) & 0xFFFFFFFF)
    )


def test_png_adam7_and_16bit():
    """Adam7 interlacing and 16-bit depth decode for real: a
    gradient image hand-packed into the seven passes must scatter
    back to the exact per-pixel values; 16-bit samples keep their
    high byte."""
    import struct
    import zlib as _z

    import numpy as np

    from zed_spark.textops.multimodal import png_pixels

    W, H = 9, 7  # odd dims exercise empty/ragged passes
    want = np.fromfunction(lambda y, x: (y * W + x) % 251, (H, W)).astype(np.uint8)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = want[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()  # filter 0 rows
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 1)  # gray, Adam7
    png = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    got = png_pixels(png)
    assert got is not None and got.shape == (H, W, 1)
    assert np.array_equal(got[..., 0], want)

    # 16-bit gray: the decoder keeps the high byte
    rows16 = bytearray()
    for y in range(3):
        rows16 += b"\x00"
        for x in range(4):
            rows16 += struct.pack(">H", ((y * 4 + x) << 8) | 0xAB)
    ihdr16 = struct.pack(">IIBBBBB", 4, 3, 16, 0, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr16)
        + _png_chunk(b"IDAT", _z.compress(bytes(rows16)))
        + _png_chunk(b"IEND", b"")
    )
    got16 = png_pixels(png16)
    assert got16 is not None and got16.shape == (3, 4, 1)
    assert got16[..., 0].ravel().tolist() == list(range(12))


def test_gif_interlaced_decode():
    """Interlaced GIFs decode: rows written in the 4-pass stream
    order come back in display order."""
    import struct

    import numpy as np

    from zed_spark.textops.multimodal import gif_pixels

    W, H = 3, 10
    # display rows 0..9 each filled with their row index; stream
    # order per spec: 0,8 then 4 then 2,6 then 1,3,5,7,9
    stream_rows = [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    out = bytearray(b"GIF89a") + struct.pack("<HH", W, H) + bytes([0xF7, 0, 0])
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, W, H) + bytes([0x40])  # interlaced
    out += bytes([8])
    codes = []
    for r in stream_rows:
        for _ in range(W):
            codes += [256, r]
    codes.append(257)
    buf = bits = 0
    coded = bytearray()
    for code in codes:
        buf |= code << bits
        bits += 9
        while bits >= 8:
            coded.append(buf & 0xFF)
            buf >>= 8
            bits -= 8
    if bits:
        coded.append(buf & 0xFF)
    for i in range(0, len(coded), 255):
        chunk = coded[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"

    px = gif_pixels(bytes(out))
    assert px is not None and px.shape == (H, W, 3)
    assert px[:, 0, 0].tolist() == list(range(H))


def test_exif_orientation():
    """EXIF orientation comes out of a genuine APP1 TIFF block in
    either byte order; files without EXIF (or with out-of-range
    values) yield None."""
    import struct

    from zed_spark.textops.multimodal import (
        jpeg_bytes,
        parse_exif_orientation,
        parse_image_header,
    )

    def app1(tiff):
        return (
            b"\xff\xe1" + struct.pack(">H", 2 + 6 + len(tiff))
            + b"Exif\x00\x00" + tiff
        )

    def tiff_le(orient):
        return (
            b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
            + struct.pack("<HHI", 274, 3, 1) + struct.pack("<H", orient)
            + b"\x00\x00" + b"\x00" * 4
        )

    base = jpeg_bytes(8, 8, fill=40)
    for o in (1, 6, 8):
        f = base[:2] + app1(tiff_le(o)) + base[2:]
        assert parse_exif_orientation(f) == o
        # the EXIF segment must not confuse the header/pixel paths
        assert parse_image_header(f)[:3] == ("jpeg", 8, 8)
    assert parse_exif_orientation(base) is None
    assert parse_exif_orientation(base[:2] + app1(tiff_le(9)) + base[2:]) is None
    tiff_be = (
        b"MM\x00*" + struct.pack(">I", 8) + struct.pack(">H", 1)
        + struct.pack(">HHI", 274, 3, 1) + struct.pack(">H", 3)
        + b"\x00\x00" + b"\x00" * 4
    )
    assert parse_exif_orientation(base[:2] + app1(tiff_be) + base[2:]) == 3


def test_png_trns_alpha_and_ogg_headers():
    """Palette PNGs with a tRNS chunk decode to RGBA (absent entries
    opaque); Ogg Opus/Vorbis identification packets yield channel
    count and sample rate."""
    import struct

    from zed_spark.textops.multimodal import parse_audio_header, png_bytes, png_pixels

    base = png_bytes(4, 2, color_type=3, fill=5)
    # splice a tRNS chunk (entries 0..5 get alpha 250..255) after PLTE
    trns = _png_chunk(b"tRNS", bytes(range(250, 256)))
    at = base.find(b"IDAT") - 4
    png = base[:at] + trns + base[at:]
    px = png_pixels(png)
    assert px is not None and px.shape == (2, 4, 4)
    assert int(px[0, 0, 3]) == 255  # index 5 -> alpha 255
    assert png_pixels(base).shape == (2, 4, 3)  # no tRNS: RGB

    def ogg_page(pkt):
        return (
            b"OggS\x00\x02" + b"\x00" * 8 + b"\x00" * 4 + b"\x00" * 4
            + b"\x00" * 4 + bytes([1, len(pkt)]) + pkt
        )

    opus = ogg_page(b"OpusHead\x01\x02\x38\x01" + struct.pack("<I", 48000) + b"\x00" * 3)
    assert parse_audio_header(opus) == ("opus", 2, 48000, None, None)
    vorb = ogg_page(b"\x01vorbis" + b"\x00" * 4 + bytes([1]) + struct.pack("<I", 44100))
    assert parse_audio_header(vorb) == ("vorbis", 1, 44100, None, None)
    assert parse_audio_header(b"OggS" + b"\x00" * 30)[0] == "ogg"


def test_ico_and_aiff_headers():
    """ICO directory entries (0-byte = 256 saturation) and AIFF COMM
    chunks (80-bit extended-float sample rate) parse from genuine
    container bytes."""
    import struct

    from zed_spark.textops.multimodal import parse_audio_header, parse_image_header

    ico = b"\x00\x00\x01\x00" + struct.pack("<H", 1) + bytes([32, 64]) + b"\x00" * 14
    assert parse_image_header(ico) == ("ico", 32, 64, None)
    ico256 = b"\x00\x00\x01\x00" + struct.pack("<H", 1) + bytes([0, 0]) + b"\x00" * 14
    assert parse_image_header(ico256) == ("ico", 256, 256, None)

    # 44100 Hz as 80-bit extended: exp 0x400E, mantissa 0xAC44<<48
    comm = (
        struct.pack(">HIH", 2, 88200, 16)
        + struct.pack(">H", 0x400E) + (0xAC44 << 48).to_bytes(8, "big")
    )
    aiff = (
        b"FORM" + struct.pack(">I", 4 + 8 + len(comm)) + b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
    )
    assert parse_audio_header(aiff) == ("aiff", 2, 44100, 16, 2.0)
    assert parse_audio_header(b"FORM\x00\x00\x00\x04AIFF") == (
        "aiff", None, None, None, None)


def test_jpeg_12bit_extended_sequential():
    """12-bit precision (SOF1): level shift 2048, coefficients in the
    12-bit domain, output downscaled to 8-bit. Hand-assembled solid
    frame with analytically known pixels."""
    import struct

    from zed_spark.textops.multimodal import jpeg_pixels

    dht, dc, ac = _jpeg_test_tables()
    qtab = bytes([8] + [16] * 63)
    FILL12 = 3000  # DC diff (3000-2048) = 952, category 10
    f = bytearray(b"\xff\xd8")
    f += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qtab
    f += b"\xff\xc1" + struct.pack(">HBHHB", 11, 12, 8, 8, 1) + bytes([1, 0x11, 0])
    f += dht
    f += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    put, flush, _ = _jpeg_test_emitter()
    _put_dc_diff(put, dc, FILL12 - 2048)
    put(ac[0x00][1], ac[0x00][0])
    f += flush() + b"\xff\xd9"

    got = jpeg_pixels(bytes(f))
    assert got is not None and got.shape == (8, 8, 1)
    # 3000 / 16 = 187.5 -> rint -> 188
    assert int(got.min()) == int(got.max()) == 188
    # 12-bit BASELINE (SOF0) stays rejected per T.81 B.2.2
    bad = bytes(f).replace(b"\xff\xc1", b"\xff\xc0", 1)
    assert jpeg_pixels(bad) is None


def test_jpeg_cmyk_and_ycck():
    """Adobe 4-component decode: transform 0 (direct inverted CMYK)
    and transform 2 (YCCK) both reduce to RGB = stored * K / 255,
    computed independently here."""
    import struct

    import numpy as np

    from zed_spark.textops.multimodal import jpeg_pixels

    dht, dc, ac = _jpeg_test_tables()
    qtab = bytes([8] + [16] * 63)

    def build(transform, vals):
        f = bytearray(b"\xff\xd8")
        f += b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
        f += b"\x00\x65\x00\x00\x00\x00" + bytes([transform])
        f += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qtab
        f += b"\xff\xc0" + struct.pack(">HBHHB", 20, 8, 8, 8, 4)
        for cid in (1, 2, 3, 4):
            f += bytes([cid, 0x11, 0])
        f += dht
        f += b"\xff\xda" + struct.pack(">HB", 14, 4)
        f += bytes([1, 0x00, 2, 0x00, 3, 0x00, 4, 0x00, 0, 63, 0])
        put, flush, _ = _jpeg_test_emitter()
        for v in vals:
            _put_dc_diff(put, dc, v - 128)
            put(ac[0x00][1], ac[0x00][0])
        return bytes(f) + flush() + b"\xff\xd9"

    # transform 0: stored (inverted) CMYK directly
    C, M, Y, K = 200, 150, 100, 220
    got = jpeg_pixels(build(0, (C, M, Y, K)))
    assert got is not None and got.shape == (8, 8, 3)
    want = [round(v * K / 255) for v in (C, M, Y)]
    assert got.min(axis=(0, 1)).tolist() == want
    assert got.max(axis=(0, 1)).tolist() == want

    # transform 2: YCCK routes CMY through the YCbCr equations
    Yl, CB, CR, K2 = 120, 140, 160, 230
    got2 = jpeg_pixels(build(2, (Yl, CB, CR, K2)))
    assert got2 is not None and got2.shape == (8, 8, 3)
    cb, cr = CB - 128.0, CR - 128.0
    chans = (
        Yl + 1.402 * cr,
        Yl - 0.344136 * cb - 0.714136 * cr,
        Yl + 1.772 * cb,
    )
    want2 = [
        int(np.clip(np.rint(np.clip(v, 0, 255) * K2 / 255.0), 0, 255))
        for v in chans
    ]
    assert got2.min(axis=(0, 1)).tolist() == want2
    assert got2.max(axis=(0, 1)).tolist() == want2
