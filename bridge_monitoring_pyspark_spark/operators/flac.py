"""Dependency-free FLAC decoder (fixed + LPC predictors) + fixture encoder.

Round 13 converts the last documented audio scope cut into real coverage:
``decode_media`` previously raised ``NotImplementedError`` for every
compressed audio codec because the container ships no librosa/ffmpeg. FLAC
is the one compressed format whose full decode path needs nothing beyond
stdlib + numpy, so — like PNG (round 7), WAV/Y4M (round 8) and JPEG
(round 8) before it — the slot becomes a production-real decoder rather
than a stub. Round 14 adds the QLP/LPC subframe path (the profile
real-world encoders emit almost always), so production FLAC no longer
routes to quarantine.

Subset decoded:

- stream header ``fLaC`` + metadata walk (STREAMINFO parsed; PADDING /
  VORBIS_COMMENT / anything else skipped via the last-block flag chain);
- frames with fixed blocking strategy: 14-bit sync, blocksize /
  sample-rate codes (incl. 8/16-bit follow-up encodings), UTF-8-coded
  frame numbers, CRC-8 header check (poly 0x07);
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the standard
  [1], [2,-1], [3,-3,1], [4,-6,4,-1] predictors), LPC orders 1-32
  (4-bit QLP precision code, 5-bit signed quantization shift, signed
  quantized coefficients, 64-bit-safe accumulator with arithmetic
  right shift — round 14), wasted-bits unary prefix;
- residuals: RICE (4-bit params) and RICE2 (5-bit params) partitioned
  coding, zigzag mapping, escape-to-verbatim partitions;
- frame footer CRC-16 (poly 0x8005) over the whole byte-aligned frame;
- whole-stream MD5 check against STREAMINFO's signature of the unencoded
  PCM (little-endian interleaved), so a silent mis-decode of ANY sample
  fails loudly instead of poisoning downstream statistics;
- trailing bytes after the final frame raise (a truncated-then-padded or
  concatenated stream never decodes silently), and an unknown stream
  length (STREAMINFO total_samples == 0, legal in FLAC) raises rather
  than silently decoding to an empty result.

Stereo decorrelation (round 14, same pass as LPC): left-side,
right-side and mid-side channel assignments decode — side channel at
bits+1, exact integer reconstruction incl. the mid/side dropped-bit
restore — and the encoder picks the assignment per frame by an order-2
residual proxy, like a real encoder's -m switch. Remaining subset
boundaries (each an explicit ``ValueError``, routed to the
decode-quarantine operator like any other unsupported payload):
variable blocking strategy and sample widths other than 8/16 bits.

The encoder exists to SYNTHESIZE deterministic fixtures (closed-form
samples, same contract as ``multimodal.synth_wav``) and for round-trip
tests; it picks the best predictor per subframe by exact coded-bit cost
— CONSTANT for flat channels, FIXED orders 0-4, and (round 14)
Levinson-Durbin LPC with quantized coefficients — plus best rice params
per partition and both partition orders 0 and 1, so the decoder's paths
are exercised by real bitstreams, not hand-built ones. ``mode="lpc"``
forces the LPC path so fixture corpora exercise it deterministically
even on signals where a fixed predictor would win the bit count.

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
    if len(zig):
        # cost(p) = sum(zig>>p) + n(1+p) is increasing once 2^p > max(zig)
        maxparam = min(maxparam, int(zig.max()).bit_length() + 1)
    for p in range(maxparam):
        bits = int((zig >> p).sum()) + len(zig) * (1 + p)
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    return best


def _rice_cost_bits(res: np.ndarray) -> int:
    """Exact single-partition coded size of a residual vector under its
    best rice parameter (4-bit param header included) — the cost model
    the encoder ranks predictor candidates with."""
    zig = _zigzag(res)
    p = _best_rice_param(zig, 15)
    return 4 + int((zig >> p).sum()) + len(zig) * (1 + p)


def _lpc_coeff_orders(sig: np.ndarray, max_order: int) -> list[np.ndarray]:
    """Levinson-Durbin over the Hann-windowed autocorrelation of ``sig``
    (apodization before autocorrelation, as real FLAC encoders do — the
    unwindowed estimate is badly edge-biased on short blocks and yields
    predictors worse than FIXED even on pure sinusoids): returns the
    float LPC coefficient vector for every order 1..max_order (one
    recursion pass yields them all), predictor convention
    ``pred[i] = sum_j a[j] * sig[i-1-j]``. Stops early if the prediction
    error hits zero (perfectly predictable signal)."""
    x = sig.astype(np.float64)
    n = len(x)
    max_order = min(max_order, n - 1)
    if max_order < 1:
        return []
    x = x * np.hanning(n) if n > 2 else x
    autoc = np.array(
        [float(np.dot(x[: n - lag], x[lag:])) for lag in range(max_order + 1)]
    )
    if autoc[0] <= 0:
        return []
    err = autoc[0]
    a = np.zeros(0)
    out: list[np.ndarray] = []
    for m in range(1, max_order + 1):
        acc = autoc[m] - float(np.dot(a, autoc[m - 1 : 0 : -1])) if m > 1 else autoc[1]
        k = acc / err
        a = np.append(a - k * a[::-1], k)
        err *= 1.0 - k * k
        out.append(a.copy())
        if err <= 0:
            break
    return out


def _quantize_lpc(coefs: np.ndarray, precision: int) -> tuple[np.ndarray, int]:
    """Quantize float LPC coefficients to signed ``precision``-bit ints
    plus a right-shift (the QLP form the bitstream carries): the largest
    shift in [0, 15] that keeps every rounded coefficient in range."""
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    cmax = float(np.abs(coefs).max())
    if cmax == 0.0:
        return np.zeros(len(coefs), dtype=np.int64), 0
    shift = 0
    while shift < 15 and round(cmax * (1 << (shift + 1))) <= qmax:
        shift += 1
    q = np.clip(np.round(coefs * (1 << shift)), qmin, qmax).astype(np.int64)
    return q, shift


_LPC_PRECISION = 12  # QLP coefficient precision the fixture encoder emits


def _order2_proxy(sig: np.ndarray) -> int:
    """Cheap channel-assignment discriminator: the order-2 fixed-predictor
    residual magnitude (= second difference). Two numpy ops — used only to
    pick the stereo decorrelation mode before the real subframe search
    runs on the two winning channels."""
    if len(sig) < 3:
        return int(np.abs(sig).sum())
    return int(np.abs(np.diff(sig, 2)).sum())


def _encode_subframe(
    sig: np.ndarray, bps: int, bs: int, mode: str, max_lpc_order: int
) -> _BitWriter:
    """Encode ONE subframe (zero-pad bit through residual) at ``bps`` bits
    per sample (``bits + 1`` for a stereo side channel): CONSTANT for flat
    signals, else the cheaper of the best FIXED order 0-4 and the best
    quantized-LPC candidate."""
    body = _BitWriter()
    body.write(0, 1)  # zero pad
    if bs > 1 and (sig == sig[0]).all():
        body.write(0b000000, 6)  # CONSTANT
        body.write(0, 1)  # no wasted bits
        body.write(int(sig[0]), bps)
        return body
    # FIXED candidate: best order 0-4 by residual-magnitude proxy
    # (one numpy op per order; exact bit cost only ranks the two
    # finalists below — this is the encoder hot path at sf0.1)
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
    # LPC candidate: Levinson-Durbin recursion once, materialize
    # quantized candidates at orders {1,2,4,max} only (libFLAC-
    # style order-subset search), ranked by EXACT coded bits —
    # warmup + QLP header (4+5+order*precision) + rice residual —
    # so header overhead is priced in and small blocks don't get
    # bloated high orders
    lpc = None  # (coded_bits, order, qcoef, shift, res)
    if mode != "fixed" and bs > 1:
        top = min(max_lpc_order, bs - 1)
        keep = {1, 2, 4, top}
        for a in _lpc_coeff_orders(sig, top):
            if len(a) not in keep:
                continue
            qcoef, shift = _quantize_lpc(a, _LPC_PRECISION)
            res = _lpc_residual(sig, qcoef, shift)
            cost = (
                len(qcoef) * bps
                + 9 + len(qcoef) * _LPC_PRECISION
                + _rice_cost_bits(res)
            )
            if lpc is None or cost < lpc[0]:
                lpc = (cost, len(qcoef), qcoef, shift, res)
    use_lpc = lpc is not None and mode == "lpc"
    if lpc is not None and mode == "auto":
        fixed_bits = best_order * bps + _rice_cost_bits(best_res)
        use_lpc = lpc[0] < fixed_bits
    if use_lpc:
        _, order, qcoef, shift, res = lpc
        body.write(0b100000 | (order - 1), 6)  # LPC subframe
        body.write(0, 1)  # no wasted bits
        for v in sig[:order]:
            body.write(int(v), bps)  # warmup samples
        body.write(_LPC_PRECISION - 1, 4)
        body.write(shift, 5)  # signed in the spec; ours is >= 0
        for c in qcoef:
            body.write(int(c), _LPC_PRECISION)
    else:
        order, res = best_order, best_res
        body.write(0b001000 | order, 6)  # FIXED subframe
        body.write(0, 1)  # no wasted bits
        for v in sig[:order]:
            body.write(int(v), bps)  # warmup samples
    # partitioned rice: order 1 when divisible and the first
    # partition keeps >=1 residual, else 0
    p = 1 if bs % 2 == 0 and (bs // 2) > order else 0
    body.write(0b00, 2)  # RICE, 4-bit params
    body.write(p, 4)
    offsets = []
    for part in range(1 << p):
        cnt = (bs >> p) - (order if part == 0 else 0)
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
    return body


def _lpc_residual(sig: np.ndarray, qcoef: np.ndarray, shift: int) -> np.ndarray:
    """Exact integer LPC residual with the decoder's semantics:
    ``res[i] = sig[i] - ((sum_j qcoef[j]*sig[i-1-j]) >> shift)`` —
    numpy's ``>>`` on int64 is an arithmetic (floor) shift, matching the
    decoder's Python-int shift. |q|<2^15, |sig|<2^15, order<=32 keeps the
    accumulator well inside int64."""
    order, n = len(qcoef), len(sig)
    pred = np.zeros(n - order, dtype=np.int64)
    for j, c in enumerate(qcoef):
        pred += int(c) * sig[order - 1 - j : n - 1 - j]
    return sig[order:] - (pred >> shift)


def flac_encode(
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    blocksize: int = 32,
    mode: str = "auto",
    max_lpc_order: int = 8,
) -> bytes:
    """Encode int PCM ``samples (n_frames, channels)`` into a spec-valid
    FLAC stream (independent channels). Fixture/test encoder: correctness
    over ratio, but choices are real — per subframe the cheapest of
    CONSTANT (flat channels), FIXED orders 0-4 and Levinson-Durbin LPC by
    exact coded-bit cost, best rice param per partition, partition order
    1 when the geometry allows.

    ``mode``: ``"auto"`` picks fixed-vs-LPC by bit cost (ties to fixed —
    cheaper decode), ``"fixed"`` never emits LPC (the round-13 behavior),
    ``"lpc"`` forces LPC wherever one is computable (non-flat subframe
    with blocksize > 1) so fixture corpora exercise the QLP decode path
    deterministically even on signals where a fixed predictor wins."""
    if mode not in ("auto", "fixed", "lpc"):
        raise ValueError(f"mode must be auto|fixed|lpc, got {mode!r}")
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
    if samples.min() < -32768 or samples.max() > 32767:
        # out-of-range input would wrap mod 2^16 identically in the bit
        # writer and the MD5's astype('<i2') — a silently corrupting
        # round-trip — so reject it loudly instead
        raise ValueError("samples out of 16-bit range [-32768, 32767]")
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
        # channel assignment: stereo frames pick per-frame among
        # independent / left-side / right-side / mid-side by the cheap
        # order-2 proxy (the real subframe search then runs only on the
        # two winning channels); mode="fixed" keeps the round-13
        # independent-channels profile
        if channels == 2 and mode != "fixed" and bs > 1:
            left, right = block[:, 0], block[:, 1]
            mid, side = (left + right) >> 1, left - right
            pl, pr = _order2_proxy(left), _order2_proxy(right)
            pm, ps = _order2_proxy(mid), _order2_proxy(side)
            assign, _ = min(
                ((0b0001, pl + pr), (0b1000, pl + ps),
                 (0b1001, ps + pr), (0b1010, pm + ps)),
                key=lambda t: t[1],
            )
            subs = {
                0b0001: [(left, bits), (right, bits)],
                0b1000: [(left, bits), (side, bits + 1)],
                0b1001: [(side, bits + 1), (right, bits)],
                0b1010: [(mid, bits), (side, bits + 1)],
            }[assign]
        else:
            assign = channels - 1
            subs = [(block[:, ch], bits) for ch in range(channels)]
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
        hdr.write(assign, 4)  # channel count / stereo decorrelation mode
        hdr.write(0b100, 3)  # 16 bits per sample, explicit
        hdr.write(0, 1)  # reserved
        hdr.align()
        head = hdr.bytes() + _utf8_frame_number(fi)
        if follow is not None:
            head += follow.to_bytes(1 if code == 0b0110 else 2, "big")
        head += bytes([crc8(head)])

        body = _BitWriter()
        for sig, bps in subs:
            sub = _encode_subframe(sig, bps, bs, mode, max_lpc_order)
            body.write(sub.acc, sub.nbits)
        body.align()
        frame = head + body.bytes()
        out += frame + crc16(frame).to_bytes(2, "big")
    return bytes(out)


def flac_decode(buf: bytes) -> dict:
    """Decode a FLAC stream (fixed + LPC predictors, independent
    channels). Returns the same shape as ``multimodal._wav_decode`` —
    ``{sample_rate, channels, bits, n_frames, samples:
    np.ndarray(n_frames, channels) int32}`` plus ``subframe_types``, the
    set of subframe kinds seen (``CONSTANT/VERBATIM/FIXED/LPC`` —
    introspection for tests; the stats stage ignores it) — so the audio
    statistics stage is codec-agnostic.

    Every integrity field the subset carries is VERIFIED, not skipped:
    frame sync + reserved bits, header CRC-8, footer CRC-16, subframe
    zero-pad bit, padding bits, decoded-sample count vs STREAMINFO,
    no-trailing-bytes after the final frame, and the stream MD5 of the
    decoded PCM vs STREAMINFO's signature."""
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
    if total == 0:
        # legal FLAC ("unknown length") but the count-driven decode loop
        # below would silently return an empty result for it
        raise ValueError("unknown total_samples (0) unsupported")

    chans: list[list[int]] = [[] for _ in range(channels)]
    seen_types: set[str] = set()
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
        if ch_assign <= 0b0111:  # independent channels
            if ch_assign + 1 != channels:
                raise ValueError("frame channel count != STREAMINFO")
        elif ch_assign in (0b1000, 0b1001, 0b1010):  # L/S, R/S, M/S
            if channels != 2:
                raise ValueError(
                    "stereo decorrelation in a non-2-channel stream"
                )
        else:
            raise ValueError(
                f"reserved channel assignment {ch_assign:#06b}"
            )
        # the side channel of a decorrelated pair carries one extra bit
        side_sub = {0b1000: 1, 0b1001: 0, 0b1010: 1}.get(ch_assign, -1)
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

        frame_sigs: list[list[int]] = []
        for ch in range(channels):
            if r.read(1) != 0:
                raise ValueError("subframe zero-pad bit set")
            stype = r.read(6)
            wasted = 0
            if r.read(1):
                wasted = 1 + r.read_unary()
            eff = bits + (1 if ch == side_sub else 0) - wasted
            if stype == 0b000000:  # CONSTANT
                sig = [r.read_signed(eff)] * bs
                seen_types.add("CONSTANT")
            elif stype == 0b000001:  # VERBATIM
                sig = [r.read_signed(eff) for _ in range(bs)]
                seen_types.add("VERBATIM")
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
                seen_types.add("FIXED")
            elif stype & 0b100000:  # LPC, order 1-32
                order = (stype & 0b011111) + 1
                if order >= bs:
                    raise ValueError("LPC order >= blocksize")
                sig = [r.read_signed(eff) for _ in range(order)]
                prec_code = r.read(4)
                if prec_code == 0b1111:
                    raise ValueError("invalid QLP precision code 0b1111")
                prec = prec_code + 1
                shift = r.read_signed(5)
                if shift < 0:
                    # reserved by the current spec (historic streams only)
                    raise ValueError("negative QLP shift unsupported")
                qcoef = [r.read_signed(prec) for _ in range(order)]
                res = _read_residual(r, bs, order)
                # Python ints: the QLP accumulator is exact at any width;
                # >> on a negative int is the spec's arithmetic shift
                for v in res:
                    pred = sum(c * sig[-1 - j] for j, c in enumerate(qcoef))
                    sig.append(v + (pred >> shift))
                seen_types.add("LPC")
            else:
                raise ValueError(f"reserved subframe type {stype:#08b}")
            frame_sigs.append([s << wasted for s in sig])
        # undo stereo decorrelation (after wasted-bit restoration)
        if ch_assign == 0b1000:  # left/side: right = left - side
            left, side = frame_sigs
            frame_sigs = [left, [l - s for l, s in zip(left, side)]]
            seen_types.add("LEFT_SIDE")
        elif ch_assign == 0b1001:  # right/side: left = right + side
            side, right = frame_sigs
            frame_sigs = [[rr + s for rr, s in zip(right, side)], right]
            seen_types.add("RIGHT_SIDE")
        elif ch_assign == 0b1010:  # mid/side
            mid, side = frame_sigs
            # m = (mid<<1) | (side&1) restores the bit the encoder's
            # (l+r)>>1 dropped; then l = (m+s)>>1, r = (m-s)>>1
            ms = [(m << 1) | (s & 1) for m, s in zip(mid, side)]
            frame_sigs = [
                [(m + s) >> 1 for m, s in zip(ms, side)],
                [(m - s) >> 1 for m, s in zip(ms, side)],
            ]
            seen_types.add("MID_SIDE")
        for ch in range(channels):
            chans[ch].extend(frame_sigs[ch])
        r.align()
        if crc16(buf[frame_start : r.byte]) != r.read(16):
            raise ValueError("frame footer CRC-16 mismatch")
        decoded += bs

    if decoded != total:
        raise ValueError(f"decoded {decoded} samples, STREAMINFO says {total}")
    if r.byte != len(buf):
        # a truncated-then-padded or concatenated stream must not decode
        # silently just because the sample count already added up
        raise ValueError(
            f"{len(buf) - r.byte} trailing bytes after the final frame"
        )
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
        "subframe_types": seen_types,
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
