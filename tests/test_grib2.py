"""First-party GRIB2 reader: round-trip against a synthetic encoder
covering simple packing (5.0), complex packing (5.2), complex packing with
second-order spatial differencing (5.3), and section-6 bitmaps."""

import struct

import numpy as np
import pytest

from dlwp_cs_tpu.data.grib2 import read_grib2, scan_messages


# ---------------------------------------------------------------------------
# minimal GRIB2 encoder (tests only)
# ---------------------------------------------------------------------------


def _pack_bits(values, nbits):
    values = np.asarray(values, np.int64)
    if nbits == 0 or len(values) == 0:
        return b""
    bits = ((values[:, None] >> np.arange(nbits - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def _sec(num, body):
    return struct.pack(">IB", len(body) + 5, num) + body


def _signed(v, size):
    sign = 1 << (8 * size - 1)
    return (abs(v) | sign if v < 0 else v).to_bytes(size, "big")


def encode_grib2(field, lats_deg, lons_deg, *, template=0, nbits=12,
                 group_len=17, bitmap=None, ref=(2020, 1, 15, 6)):
    """Encode one (ny, nx) float field as a single-message GRIB2 byte string."""
    ny, nx = field.shape
    flat = field.reshape(-1)
    if bitmap is not None:
        flat = flat[bitmap.reshape(-1)]
    D = 2
    scaled = np.round(flat * 10.0**D)
    R = float(scaled.min())
    X = (scaled - R).astype(np.int64)  # E = 0
    nbits = max(nbits, int(X.max()).bit_length())

    # octets 6..21: centre(2) subcentre(2) tables(1) local(1) sig(1)
    # year(2) month day hour min sec status type
    sec1 = (
        b"\x00" * 7
        + struct.pack(">H", ref[0]) + bytes([ref[1], ref[2], ref[3], 0, 0, 0, 1])
    )
    # section 3: grid template 3.0 regular lat-lon
    # full 72-octet template-3.0 section (5-byte header + 67 payload bytes):
    # real files carry Di/Dj (octets 64-71) and the scanning mode (octet 72)
    g = bytearray(67)
    g[0] = 0
    g[1:5] = struct.pack(">I", ny * nx)
    g[7:9] = struct.pack(">H", 0)  # template 3.0
    g[25:29] = struct.pack(">I", nx)
    g[29:33] = struct.pack(">I", ny)
    g[41:45] = _signed(int(round(lats_deg[0] * 1e6)), 4)
    g[45:49] = struct.pack(">I", int(round(lons_deg[0] * 1e6)) % (360 * 10**6))
    g[49] = 48
    g[50:54] = _signed(int(round(lats_deg[-1] * 1e6)), 4)
    g[54:58] = struct.pack(">I", int(round(lons_deg[-1] * 1e6)) % (360 * 10**6))
    # octet 72 (payload index 66): scanning mode — +i, j direction per the
    # lat ordering, row-major
    g[66] = 0x40 if lats_deg[-1] > lats_deg[0] else 0x00
    sec3 = bytes(g)
    # section 4: product template 4.0, category 3 number 5 (geopot. height),
    # surface type 100 (isobaric), value 50000 Pa
    p = bytearray(29)
    p[2:4] = struct.pack(">H", 0)
    p[4] = 3
    p[5] = 5
    p[17] = 100
    p[18] = 0
    p[19:23] = struct.pack(">I", 50000)
    sec4 = bytes(p)

    if template == 40:
        # JPEG2000 packing: section 7 is a raw lossless J2K codestream of X
        import io
        from PIL import Image

        r = bytearray(18)
        r[0:4] = struct.pack(">I", len(X))
        r[4:6] = struct.pack(">H", 40)
        r[6:10] = struct.pack(">f", R)
        r[10:12] = _signed(0, 2)
        r[12:14] = _signed(D, 2)
        r[14] = nbits
        r[15] = 0  # type of original field
        r[16] = 0  # lossless
        r[17] = 255
        sec5 = bytes(r)
        img = Image.fromarray(X.reshape(ny, nx).astype(np.uint16))
        buf = io.BytesIO()
        img.save(buf, format="JPEG2000", irreversible=False, no_jp2=True)
        data = buf.getvalue()
    elif template == 0:
        r = bytearray(16)
        r[0:4] = struct.pack(">I", len(X))
        r[4:6] = struct.pack(">H", 0)
        r[6:10] = struct.pack(">f", R)
        r[10:12] = _signed(0, 2)
        r[12:14] = _signed(D, 2)
        r[14] = nbits
        sec5 = bytes(r)
        data = _pack_bits(X, nbits)
    else:
        # group the data
        Y = X.copy()
        extras = b""
        if template == 3:  # 2nd-order spatial differencing
            d = np.zeros_like(Y)
            d[2:] = Y[2:] - 2 * Y[1:-1] + Y[:-2]
            minsd = int(d[2:].min()) if len(d) > 2 else 0
            w = 4
            extras = _signed(int(Y[0]), w) + _signed(int(Y[1]), w) + _signed(minsd, w)
            Y = d - minsd
            Y[0] = 0
            Y[1] = 0
        groups = [Y[i : i + group_len] for i in range(0, len(Y), group_len)]
        refs = np.array([int(gr.min()) for gr in groups])
        widths = np.array(
            [max(int(gr.max() - rf).bit_length(), 1) for gr, rf in zip(groups, refs)]
        )
        lens = np.array([len(gr) for gr in groups])
        wref = int(widths.min())
        wbits = 6
        lref, linc, lbits = 0, 1, 16
        r = bytearray(47 + (2 if template == 3 else 0))
        r[0:4] = struct.pack(">I", len(X))
        r[4:6] = struct.pack(">H", template)
        r[6:10] = struct.pack(">f", R)
        r[10:12] = _signed(0, 2)
        r[12:14] = _signed(D, 2)
        r[14] = nbits
        r[16] = 1  # general group splitting
        r[17] = 0  # no missing value management
        r[26:30] = struct.pack(">I", len(groups))
        r[30] = wref
        r[31] = wbits
        r[32:36] = struct.pack(">I", lref)
        r[36] = linc
        r[37:41] = struct.pack(">I", int(lens[-1]))
        r[41] = lbits
        if template == 3:
            r[42] = 2  # order
            r[43] = 4  # octets per extra descriptor
        sec5 = bytes(r)
        data = extras
        data += _pack_bits(refs, nbits)
        data += _pack_bits(widths - wref, wbits)
        data += _pack_bits((lens - lref) // linc, lbits)
        # group data: ONE continuous bitstream (no per-group alignment)
        stream = []
        for gr, rf, wd in zip(groups, refs, widths):
            vals = np.asarray(gr - rf, np.int64)
            stream.append(
                ((vals[:, None] >> np.arange(wd - 1, -1, -1)) & 1)
                .astype(np.uint8).reshape(-1)
            )
        if stream:
            data += np.packbits(np.concatenate(stream)).tobytes()

    if bitmap is not None:
        sec6 = bytes([0]) + np.packbits(
            bitmap.reshape(-1).astype(np.uint8)
        ).tobytes()
    else:
        sec6 = bytes([255])
    body = (
        _sec(1, sec1) + _sec(3, sec3) + _sec(4, sec4)
        + _sec(5, sec5) + _sec(6, sec6) + _sec(7, data)
    )
    total = 16 + len(body) + 4
    head = b"GRIB" + b"\x00\x00" + bytes([0, 2]) + struct.pack(">Q", total)
    return head + body + b"7777"


def _field(ny=19, nx=36, seed=0):
    rng = np.random.default_rng(seed)
    lat = np.linspace(90, -90, ny)
    lon = np.arange(nx) * (360.0 / nx)
    glat, glon = np.meshgrid(np.deg2rad(lat), np.deg2rad(lon), indexing="ij")
    f = 5300 + 150 * np.sin(glat) * np.cos(2 * glon) + rng.normal(size=(ny, nx))
    return np.round(f, 2), lat, lon


@pytest.mark.parametrize("template", [0, 2, 3, 40])
def test_roundtrip(tmp_path, template):
    f, lat, lon = _field()
    p = tmp_path / "t.grb2"
    p.write_bytes(encode_grib2(f, lat, lon, template=template))
    recs = read_grib2(p)
    assert len(recs) == 1
    r = recs[0]
    assert r.param == (0, 3, 5)
    assert r.surface_type == 100 and r.surface_value == 50000
    np.testing.assert_allclose(np.rad2deg(r.lats), lat, atol=1e-5)
    np.testing.assert_allclose(np.rad2deg(r.lons), lon, atol=1e-5)
    np.testing.assert_allclose(r.values, f, atol=0.005)
    # reference time: 2020-01-15 06 UTC = 7319.25 days since 2000-01-01
    assert r.ref_time_days == pytest.approx(7319.25)


def test_bitmap_missing_values(tmp_path):
    f, lat, lon = _field(seed=1)
    mask = np.random.default_rng(2).random(f.shape) > 0.3  # True = present
    p = tmp_path / "b.grb2"
    p.write_bytes(encode_grib2(f, lat, lon, template=0, bitmap=mask))
    r = read_grib2(p)[0]
    np.testing.assert_allclose(r.values[mask], f[mask], atol=0.005)
    assert np.all(np.isnan(r.values[~mask]))


def test_multi_message_and_filter(tmp_path):
    f1, lat, lon = _field(seed=3)
    f2, _, _ = _field(seed=4)
    p = tmp_path / "m.grb2"
    p.write_bytes(
        encode_grib2(f1, lat, lon, template=0) + encode_grib2(f2, lat, lon, template=2)
    )
    assert len(list(scan_messages(p))) == 2
    recs = read_grib2(p)
    assert len(recs) == 2
    np.testing.assert_allclose(recs[1].values, f2, atol=0.005)
    assert read_grib2(p, param=(0, 3, 5)) and not read_grib2(p, param=(0, 0, 0))


def test_cfs_open_grib(tmp_path):
    """CFSReanalysis.open_grib decodes raw .grb2 directly (SURVEY §2.14)."""
    from dlwp_cs_tpu.data import CFSReanalysis

    f, lat, lon = _field(seed=5)
    p = tmp_path / "z500.l.gdas.202001.grb2"
    p.write_bytes(encode_grib2(f, lat, lon, template=3))
    recs = CFSReanalysis(root_directory=tmp_path).open_grib(p)
    assert len(recs) == 1
    np.testing.assert_allclose(recs[0].values, f, atol=0.005)


def test_unsupported_template_rejected(tmp_path):
    f, lat, lon = _field()
    raw = bytearray(encode_grib2(f, lat, lon, template=0))
    # corrupt the representation template number to 4 (IEEE floats)
    pos = 16
    while pos < len(raw) - 4:
        seclen = int.from_bytes(raw[pos : pos + 4], "big")
        if raw[pos + 4] == 5:
            raw[pos + 9 : pos + 11] = (4).to_bytes(2, "big")
            break
        pos += seclen
    p = tmp_path / "bad.grb2"
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="5.4"):
        read_grib2(p)


def test_zero_section_length_rejected(tmp_path):
    """Round 5: a zeroed section-length field must raise, not spin forever
    (pos += 0 never advanced the section scan)."""
    f, lat, lon = _field()
    raw = bytearray(encode_grib2(f, lat, lon, template=0))
    raw[16:20] = (0).to_bytes(4, "big")  # first section's length -> 0
    p = tmp_path / "zerolen.grb2"
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="corrupt GRIB2 section"):
        read_grib2(p)
