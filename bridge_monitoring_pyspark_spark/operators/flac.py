"""Dependency-free FLAC decoder (fixed-predictor subset) + fixture encoder.

Round 13 converts the last documented audio scope cut into real coverage:
``decode_media`` previously raised ``NotImplementedError`` for every
compressed audio codec because the container ships no librosa/ffmpeg. FLAC
is the one compressed format whose full decode path needs nothing beyond
stdlib + numpy, so — like PNG (round 7), WAV/Y4M (round 8) and JPEG
(round 8) before it — the slot becomes a production-real decoder rather
than a stub.

Subset decoded (the "fixed" profile every FLAC encoder can emit):

- stream header ``fLaC`` + metadata walk (STREAMINFO parsed; PADDING /
  VORBIS_COMMENT / anything else skipped via the last-block flag chain);
- frames with fixed blocking strategy: 14-bit sync, blocksize /
  sample-rate codes (incl. 8/16-bit follow-up encodings), UTF-8-coded
  frame numbers, CRC-8 header check (poly 0x07);
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the standard
  [1], [2,-1], [3,-3,1], [4,-6,4,-1] predictors), wasted-bits unary
  prefix;
- residuals: RICE (4-bit params) and RICE2 (5-bit params) partitioned
  coding, zigzag mapping, escape-to-verbatim partitions;
- frame footer CRC-16 (poly 0x8005) over the whole byte-aligned frame;
- whole-stream MD5 check against STREAMINFO's signature of the unencoded
  PCM (little-endian interleaved), so a silent mis-decode of ANY sample
  fails loudly instead of poisoning downstream statistics.

LPC subframes (type ``1xxxxx``) raise ``ValueError`` with a clear message
— they need the full 32-bit QLP path; the fixture encoder never emits
them, and a real ingest would route such files to the decode-quarantine
operator like any other unsupported payload.

The encoder exists to SYNTHESIZE deterministic fixtures (closed-form
samples, same contract as ``multimodal.synth_wav``) and for round-trip
tests; it picks the best fixed predictor per subframe, rice params per
partition, and emits both partition orders 0 and 1 plus CONSTANT
subframes where a channel is flat — so the decoder's paths are exercised
by real bitstreams, not hand-built ones.

No counterpart in the 550-LoC reference (no binary columns at all there;
reference scope: pipelines/bronze_ingest.py + silver_enrichment.py +
gold_aggregation.py) — this is the audio leg of the multimodal
training-data pipeline capability class.
"""

from __future__ import annotations

import hashlib

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODE = {
    192: 0b0001,
    576: 0b0010, 1152: 0b0011, 2304: 0b0100, 4608: 0b0101,
    256: 0b1000, 512: 0b1001, 1024: 0b1010, 2048: 0b1011,
    4096: 0b1100, 8192: 0b1101, 16384: 0b1110, 32768: 0b1111,
}
_BLOCKSIZE_FROM_CODE = {v: k for k, v in _BLOCKSIZE_CODE.items()}


def _crc_table(poly: int, width: int) -> list[int]:
    top, mask = 1 << (width - 1), (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly if crc & top else crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0, MSB-first — the FLAC frame
    header checksum. Table-driven."""
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0, MSB-first — the
    FLAC frame footer checksum. Table-driven."""
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[(crc >> 8) ^ b] ^ ((crc << 8) & 0xFFFF)
    return crc


class _BitReader:
    """MSB-first bit reader, numpy-backed for speed: the stream unpacks to
    a bit array ONCE, field reads are packbits slices, and rice unary runs
    are found by binary search over the precomputed set-bit index — the
    quotient's zeros end at the first set bit at/after the cursor, so
    ``searchsorted`` replaces the per-bit loop that made the first cut of
    this decoder ~20× too slow for the bench. Byte/bit position accessors
    are kept because CRC spans are byte ranges."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.p = pos * 8

    @property
    def byte(self) -> int:
        return self.p >> 3

    @property
    def bit(self) -> int:
        return self.p & 7

    def read(self, n: int) -> int:
        if self.p + n > len(self.bits):
            raise ValueError("truncated FLAC stream (bit read past end)")
        if n == 0:
            return 0
        seg = self.bits[self.p : self.p + n]
        self.p += n
        return int.from_bytes(np.packbits(seg).tobytes(), "big") >> (
            (-n) % 8
        )

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        k = int(np.searchsorted(self.ones, self.p))
        if k == len(self.ones):
            raise ValueError("truncated FLAC stream (unary run past end)")
        q = int(self.ones[k]) - self.p
        self.p += q + 1  # zeros + the terminating 1
        return q

    def align(self) -> None:
        if self.p & 7:
            if self.read(8 - (self.p & 7)) != 0:
                raise ValueError("nonzero frame padding bits")


class _BitWriter:
    """MSB-first writer over a single big-int accumulator (append-only
    shift-or; writers are per-frame so the accumulator stays small)."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n

    def write_unary(self, q: int) -> None:
        self.write(1, q + 1)  # q zeros then a 1, in one shift

    def align(self) -> None:
        if self.nbits & 7:
            self.write(0, 8 - (self.nbits & 7))

    def bytes(self) -> bytes:
        assert self.nbits % 8 == 0
        return self.acc.to_bytes(self.nbits // 8, "big")


def _utf8_frame_number(n: int) -> bytes:
    """FLAC's UTF-8-style coding of the frame number (1-7 bytes)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC)):
        if n < 1 << (5 * nbytes + 1):
            cont = [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(nbytes - 2, -1, -1)]
            return bytes([lead | (n >> (6 * (nbytes - 1)))] + cont)
    raise ValueError("frame number too large")


def _read_utf8_frame_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    ones = 0  # leading ones give the byte count, UTF-8 style
    while b0 & (0x80 >> ones):
        ones += 1
    if ones < 2 or ones > 7:
        raise ValueError(f"bad UTF-8 frame-number lead byte {b0:#x}")
    n = b0 & (0x7F >> ones)
    for _ in range(ones - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 frame-number continuation byte")
        n = (n << 6) | (c & 0x3F)
    return n


def _zigzag(v: np.ndarray) -> np.ndarray:
    return (v << 1) ^ (v >> 63)


def _best_rice_param(zig: np.ndarray, maxparam: int) -> int:
    """Smallest-output rice parameter for a partition's zigzagged
    residuals (exact cost model: sum(q)+n·(1+param))."""
    best, best_bits = 0, None
    for p in range(maxparam):
        bits = int((zig >> p).sum()) + len(zig) * (1 + p)
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    return best


def flac_encode(
    samples: np.ndarray, sample_rate: int, bits: int = 16, blocksize: int = 32
) -> bytes:
    """Encode int PCM ``samples (n_frames, channels)`` into a spec-valid
    fixed-predictor FLAC stream (independent channels). Fixture/test
    encoder: correctness over ratio, but choices are real — best fixed
    order 0-4 per subframe, CONSTANT for flat channels, best rice param
    per partition, partition order 1 when the geometry allows."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim != 2:
        raise ValueError("samples must be (n_frames, channels)")
    n, channels = samples.shape
    if not 1 <= channels <= 8:
        raise ValueError("1-8 channels supported")
    if bits != 16:
        raise ValueError("fixture encoder emits 16-bit streams only")

    if n == 0:
        raise ValueError("empty sample array")
    md5 = hashlib.md5(
        samples.astype("<i2").tobytes()  # interleaved little-endian PCM
    ).digest()

    # STREAMINFO: min/max blocksize (fixed-blocking convention: both are
    # the nominal blocksize, final partial block excluded), min/max
    # framesize (0=unknown), rate(20) ch-1(3) bps-1(5) total(36), md5(128)
    w = _BitWriter()
    w.write(blocksize, 16)
    w.write(blocksize, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sample_rate, 20)
    w.write(channels - 1, 3)
    w.write(bits - 1, 5)
    w.write(n, 36)
    streaminfo = w.bytes() + md5
    assert len(streaminfo) == 34

    out = bytearray(b"fLaC")
    out += bytes([0x00]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    # an ancillary PADDING block exercises the decoder's metadata skip
    out += bytes([0x80 | 0x01]) + (4).to_bytes(3, "big") + b"\x00" * 4

    for fi, start in enumerate(range(0, n, blocksize)):
        block = samples[start : start + blocksize]
        bs = len(block)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking strategy
        code = _BLOCKSIZE_CODE.get(bs)
        follow = None
        if code is None:
            code, follow = (0b0110, bs - 1) if bs <= 256 else (0b0111, bs - 1)
        hdr.write(code, 4)
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(channels - 1, 4)  # independent channels
        hdr.write(0b100, 3)  # 16 bits per sample, explicit
        hdr.write(0, 1)  # reserved
        hdr.align()
        head = hdr.bytes() + _utf8_frame_number(fi)
        if follow is not None:
            head += follow.to_bytes(1 if code == 0b0110 else 2, "big")
        head += bytes([crc8(head)])

        body = _BitWriter()
        for ch in range(channels):
            sig = block[:, ch]
            body.write(0, 1)  # zero pad
            if bs > 1 and (sig == sig[0]).all():
                body.write(0b000000, 6)  # CONSTANT
                body.write(0, 1)  # no wasted bits
                body.write(int(sig[0]), bits)
                continue
            # best fixed order by exact residual-magnitude cost
            best_order, best_res, best_cost = 0, sig.copy(), None
            for order, coef in FIXED_COEFFS.items():
                if order >= bs:
                    break
                res = sig[order:].copy()
                for j, c in enumerate(coef):
                    res = res - c * sig[order - 1 - j : bs - 1 - j]
                cost = int(np.abs(res).sum())
                if best_cost is None or cost < best_cost:
                    best_order, best_res, best_cost = order, res, cost
            body.write(0b001000 | best_order, 6)  # FIXED subframe
            body.write(0, 1)  # no wasted bits
            for v in sig[:best_order]:
                body.write(int(v), bits)  # warmup samples
            # partitioned rice: order 1 when divisible and the first
            # partition keeps >=1 residual, else 0
            p = 1 if bs % 2 == 0 and (bs // 2) > best_order else 0
            body.write(0b00, 2)  # RICE, 4-bit params
            body.write(p, 4)
            res = best_res
            offsets = []
            for part in range(1 << p):
                cnt = (bs >> p) - (best_order if part == 0 else 0)
                offsets.append(cnt)
            assert sum(offsets) == len(res)
            pos = 0
            for cnt in offsets:
                zig = _zigzag(res[pos : pos + cnt])
                pos += cnt
                param = _best_rice_param(zig, 15)
                body.write(param, 4)
                for z in zig:
                    body.write_unary(int(z) >> param)
                    body.write(int(z) & ((1 << param) - 1), param)
        body.align()
        frame = head + body.bytes()
        out += frame + crc16(frame).to_bytes(2, "big")
    return bytes(out)


def flac_decode(buf: bytes) -> dict:
    """Decode a fixed-predictor-subset FLAC stream. Returns the same shape
    as ``multimodal._wav_decode`` — ``{sample_rate, channels, bits,
    n_frames, samples: np.ndarray(n_frames, channels) int32}`` — so the
    audio statistics stage is codec-agnostic.

    Every integrity field the subset carries is VERIFIED, not skipped:
    frame sync + reserved bits, header CRC-8, footer CRC-16, subframe
    zero-pad bit, padding bits, decoded-sample count vs STREAMINFO, and
    the stream MD5 of the decoded PCM vs STREAMINFO's signature."""
    buf = bytes(buf)
    if len(buf) < 42 or buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    # metadata walk
    pos, last, streaminfo = 4, False, None
    while not last:
        if pos + 4 > len(buf):
            raise ValueError("truncated metadata block header")
        last = bool(buf[pos] & 0x80)
        btype = buf[pos] & 0x7F
        blen = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {blen}")
            if streaminfo is not None:
                raise ValueError("duplicate STREAMINFO")
            streaminfo = body
        pos += 4 + blen
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    r = _BitReader(streaminfo)
    r.read(16)  # min blocksize
    max_bs = r.read(16)
    r.read(24), r.read(24)  # min/max framesize (unknown ok)
    rate = r.read(20)
    channels = r.read(3) + 1
    bits = r.read(5) + 1
    total = r.read(36)
    md5_expect = streaminfo[18:34]
    if bits not in (8, 16):
        raise ValueError(f"only 8/16-bit streams supported, got {bits}")
    if max_bs == 0:
        raise ValueError("max blocksize 0")

    chans: list[list[int]] = [[] for _ in range(channels)]
    decoded = 0
    r = _BitReader(buf, pos)  # one unpack for the whole stream
    while r.byte < len(buf) and decoded < total:
        frame_start = r.byte
        if r.read(14) != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {frame_start}")
        if r.read(1) != 0:
            raise ValueError("reserved frame-header bit set")
        if r.read(1) != 0:
            raise ValueError("variable blocking strategy unsupported")
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_assign = r.read(4)
        ss_code = r.read(3)
        if r.read(1) != 0:
            raise ValueError("reserved frame-header bit set")
        if ch_assign > 0b0111:
            raise ValueError(
                "stereo-decorrelated channel assignments unsupported "
                "(independent channels only)"
            )
        if ch_assign + 1 != channels:
            raise ValueError("frame channel count != STREAMINFO")
        _read_utf8_frame_number(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code in _BLOCKSIZE_FROM_CODE:
            bs = _BLOCKSIZE_FROM_CODE[bs_code]
        else:
            raise ValueError(f"reserved blocksize code {bs_code:#b}")
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample-rate code 0b1111")
        # 0b0000 = from STREAMINFO; fixed table codes carry no payload
        if ss_code == 0b000:
            fbits = bits
        elif ss_code in (0b001, 0b100, 0b110):
            fbits = {0b001: 8, 0b100: 16, 0b110: 24}[ss_code]
        else:
            raise ValueError(f"unsupported sample-size code {ss_code:#b}")
        if fbits != bits:
            raise ValueError("frame sample size != STREAMINFO")
        assert r.bit == 0  # header fields end byte-aligned pre-CRC
        if crc8(buf[frame_start : r.byte]) != r.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        for ch in range(channels):
            if r.read(1) != 0:
                raise ValueError("subframe zero-pad bit set")
            stype = r.read(6)
            wasted = 0
            if r.read(1):
                wasted = 1 + r.read_unary()
            eff = bits - wasted
            if stype == 0b000000:  # CONSTANT
                sig = [r.read_signed(eff)] * bs
            elif stype == 0b000001:  # VERBATIM
                sig = [r.read_signed(eff) for _ in range(bs)]
            elif 0b001000 <= stype <= 0b001100:  # FIXED
                order = stype & 0b000111
                if order >= bs:
                    raise ValueError("fixed order >= blocksize")
                sig = [r.read_signed(eff) for _ in range(order)]
                res = _read_residual(r, bs, order)
                coef = FIXED_COEFFS[order]
                for v in res:
                    pred = sum(c * sig[-1 - j] for j, c in enumerate(coef))
                    sig.append(v + pred)
            elif stype & 0b100000:
                raise ValueError("LPC subframes unsupported (fixed subset)")
            else:
                raise ValueError(f"reserved subframe type {stype:#08b}")
            chans[ch].extend(s << wasted for s in sig)
        r.align()
        if crc16(buf[frame_start : r.byte]) != r.read(16):
            raise ValueError("frame footer CRC-16 mismatch")
        decoded += bs

    if decoded != total:
        raise ValueError(f"decoded {decoded} samples, STREAMINFO says {total}")
    if any(len(c) != total for c in chans):
        raise ValueError("channel length mismatch")
    samples = np.array(chans, dtype=np.int32).T.copy()
    if md5_expect != b"\x00" * 16:
        got = hashlib.md5(
            samples.astype("<i2" if bits == 16 else "<i1").tobytes()
        ).digest()
        if got != md5_expect:
            raise ValueError("stream MD5 mismatch (mis-decoded samples)")
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": total,
        "samples": samples,
    }


def _read_residual(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method not in (0b00, 0b01):
        raise ValueError(f"reserved residual method {method:#b}")
    pbits = 4 if method == 0b00 else 5
    escape = (1 << pbits) - 1
    p = r.read(4)
    if blocksize % (1 << p):
        raise ValueError("blocksize not divisible by partition count")
    out: list[int] = []
    for part in range(1 << p):
        cnt = (blocksize >> p) - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("first rice partition smaller than order")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.extend(r.read_signed(raw) if raw else 0 for _ in range(cnt))
            continue
        for _ in range(cnt):
            q = r.read_unary()
            z = (q << param) | r.read(param)
            out.append((z >> 1) ^ -(z & 1))  # un-zigzag
    return out
