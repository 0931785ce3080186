"""Garmin DEM tile bit-stream codec.

The reference stores elevation rasters as per-tile compressed bit
streams (``imgfmt/app/dem/DEMTile.java``).  The scheme is an adaptive
predictive coder worked out by Frank Stinner: each height is predicted
from its left/upper neighbours, the residual is written with one of
two entropy modes (hybrid Rice-style or pure run-length), and the mode
plus its ``hunit`` divisor are themselves predicted from running sums
over the residuals seen so far.  Runs of equal deltas along a row are
collapsed through a plateau table (``DEMTile.java:74-75``).  Encoder
and decoder never exchange mode decisions — both derive them from the
same state, so this module implements the state machine once and runs
it in two directions.

Parity anchors (all ported to tests/test_dem_codec.py):
 - ``DemTileTest.java`` golden bit streams (the Dem-Daten.pdf example),
 - header fields base/maxDelta/encodingType (``DEMTile.java:83-117``),
 - round-trip equality on randomized grids.

Scale shape: a tile is a bounded 64x64 (or smaller edge) matrix; the
codec is pure per-tile CPU work with zero shared state, so Spark runs
it as an Arrow-batched kernel over independently distributed tiles.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

# The reference reads .hgt voids as -32768 (HGTReader.UNDEF).
UNDEF = -0x8000

# Plateau run-length table: unit size per table position and the
# number of binary remainder bits at each position (DEMTile.java:74-75).
_PLATEAU_UNIT = (1, 1, 1, 1, 2, 2, 2, 2, 4, 4, 4, 4, 8, 8, 8, 8,
                 16, 16, 32, 32, 64, 64, 128)
_PLATEAU_BITS = (0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4,
                 4, 5, 5, 6, 6, 7, 8)

# calc-type tags (CalcType in the reference)
_STD, _PLAT_ZERO, _PLAT_NONZERO = 0, 1, 2
# entropy modes / wrap variants
_HYBRID, _LEN = 0, 1
_WRAP0, _WRAP1, _WRAP2 = 0, 1, 2


def _max_zero_bits(max_height: int) -> int:
    """Longest zero run read as a number (DEMTile.getMaxLengthZeroBits)."""
    for bound, bits in ((2, 15), (4, 16), (8, 17), (16, 18), (32, 19),
                        (64, 20), (128, 21), (256, 22), (512, 25),
                        (1024, 28), (2048, 31), (4096, 34), (8192, 37),
                        (16384, 40)):
        if max_height < bound:
            return bits
    return 43


def _start_hunit(max_height: int) -> int:
    """Initial hybrid divisor (DEMTile.getStartHUnit)."""
    for bound, hu in ((0x9F, 1), (0x11F, 2), (0x21F, 4), (0x41F, 8),
                      (0x81F, 16), (0x101F, 32), (0x201F, 64),
                      (0x401F, 128)):
        if max_height < bound:
            return hu
    return 256


def _big_bin_bits(max_height: int) -> int:
    """Width of the escape binary value (DEMTile.getBigBinBits)."""
    if max_height < 16384:
        return max_height.bit_length()
    return 15


def _norm_hunit(hu: int) -> int:
    """Snap a divisor to the highest power of two <= hu, or 0."""
    if hu <= 0:
        return 0
    return 1 << (hu.bit_length() - 1)


def _eval_region(oldsum: int, n: int, x: int) -> int:
    """Region classifier for the length-mode running sum
    (DEMTile.getEvaluateDataRegion; note the elemcount==63 special
    case shifts one boundary by 1)."""
    if x < -2 - ((oldsum + 3 * n) >> 1):
        return 0
    b1 = -((oldsum + n) >> 1) - (1 if n >= 63 else 0)
    if x < b1:
        return 1
    if x < 2 - ((oldsum - n) >> 1):
        return 2
    if x < 4 - ((oldsum - 3 * n) >> 1):
        return 3
    return 4


def _eval_data(oldsum: int, n: int, x: int, region: int) -> int:
    """Per-region increment of the length-mode sum (DEMTile.evaluateData)."""
    if region == 0:
        return -1 - oldsum - n
    if region == 1:
        return 2 * (x + n) + 3
    if region == 2:
        return 2 * x - 1
    if region == 3:
        return 2 * (x - n) - 5
    return 1 - oldsum + n


def _java_div(a: int, b: int) -> int:
    """Java int division truncates toward zero; Python floors."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _java_rem(a: int, b: int) -> int:
    return a - b * _java_div(a, b)


class _Predicter:
    """Running statistics for one calc type; decides the entropy mode,
    divisor and wrap variant for the next residual exactly as
    DEMTile.ValPredicter does."""

    __slots__ = ("kind", "max_delta", "sum_h", "sum_l", "count", "hunit",
                 "enc", "wrap_kind", "unit_delta", "max_zero", "ddiff",
                 "_wraps", "_hwrap")

    def __init__(self, kind: int, max_delta: int):
        self.kind = kind
        self.max_delta = max_delta
        nz = _max_zero_bits(max_delta)
        if kind != _STD:
            nz -= 1
        self.max_zero = nz
        self.unit_delta = max(0, max_delta - 0x5F) // 0x40
        self.enc = _HYBRID
        self.wrap_kind = _WRAP0
        self.hunit = _start_hunit(max_delta)
        self.sum_h = 0
        self.sum_l = 0
        self.count = 0
        self.ddiff = 0
        m = max_delta
        if m % 2 == 0:
            self._wraps = ((m // 2, -m // 2), ((m + 2) // 2, -m // 2),
                           (m // 2, -m // 2))
        else:
            self._wraps = (((m + 1) // 2, -(m - 1) // 2),
                           ((m + 1) // 2, -(m - 1) // 2),
                           ((m - 1) // 2, -(m + 1) // 2))
        self._hwrap = ((m + 1) // 2, -(m - 1) // 2)

    def wrap_bounds(self) -> Tuple[int, int]:
        if self.enc == _HYBRID:
            return self._hwrap
        return self._wraps[self.wrap_kind]

    def wrap(self, v: int) -> int:
        down, up = self.wrap_bounds()
        if v > down:
            v -= self.max_delta + 1
        if v < up:
            v += self.max_delta + 1
        return v

    # --- shared forward/backward transforms --------------------------------

    def delta1_of_wrapped(self, wrapped: int) -> int:
        d = wrapped
        if self.kind == _PLAT_ZERO:
            if d <= 0:
                d += 1
        elif self.kind == _PLAT_NONZERO and self.ddiff > 0:
            d = -d
        return d

    def wrapped_of_delta1(self, d: int) -> int:
        if self.kind == _PLAT_ZERO:
            # forward shifted non-positives up by one; split at <=0
            return d - 1 if d <= 0 else d
        if self.kind == _PLAT_NONZERO and self.ddiff > 0:
            return -d
        return d

    def delta2_of_delta1(self, d: int) -> int:
        if self.wrap_kind == _WRAP1:
            return 1 - d
        if self.wrap_kind == _WRAP2:
            return -d
        return d

    def delta1_of_delta2(self, d: int) -> int:
        if self.wrap_kind == _WRAP1:
            return 1 - d
        if self.wrap_kind == _WRAP2:
            return -d
        return d

    # --- state update (DEMTile.ValPredicter.processVal) --------------------

    def process(self, delta1: int) -> None:
        ud = self.unit_delta
        if self.kind == _STD:
            self.sum_h += abs(delta1)
            if self.sum_h + ud + 1 >= 0xFFFF:
                self.sum_h -= 0x10000
            region = -1
            work = delta1
            if self.count == 63:
                region = _eval_region(self.sum_l, self.count, delta1)
                even = delta1 % 2 == 0
                sum_l1 = _java_rem(self.sum_l - 1, 4) == 0
                if region in (0, 2, 4):
                    if sum_l1 != even:
                        work += 1
                elif region == 1:
                    work += 1
                    if sum_l1 != even:
                        work += 1
                elif region == 3:
                    if sum_l1 == even:
                        work -= 1
            if region < 0:
                region = _eval_region(self.sum_l, self.count, work)
            self.sum_l += _eval_data(self.sum_l, self.count, work, region)
            self.count += 1
            if self.count == 64:
                self.count = 32
                self.sum_h = ((self.sum_h - ud) >> 1) - 1
                self.sum_l = _java_div(self.sum_l, 2)
            self.hunit = _norm_hunit(
                _java_div(ud + self.sum_h + 1, self.count + 1))
            self.wrap_kind = _WRAP0
            if self.hunit > 0:
                self.enc = _HYBRID
            else:
                self.enc = _LEN
                if self.sum_l > 0:
                    self.wrap_kind = _WRAP1
        elif self.kind == _PLAT_ZERO:
            self.sum_h += delta1 if delta1 > 0 else 1 - delta1
            if self.sum_h + ud + 1 >= 0xFFFF:
                self.sum_h -= 0x10000
            self.sum_l += -1 if delta1 <= 0 else 1
            self.count += 1
            if self.count == 64:
                self.count = 32
                self.sum_h = ((self.sum_h - ud) >> 1) - 1
                self.sum_l = _java_div(self.sum_l, 2)
                if self.sum_l % 2 != 0:
                    self.sum_l += 1
            self.hunit = _norm_hunit(
                _java_div(ud + self.sum_h + 1 - self.count // 2,
                          self.count + 1))
            self.wrap_kind = _WRAP0
            if self.hunit > 0:
                self.enc = _HYBRID
            else:
                self.enc = _LEN
                if self.sum_l >= 0:
                    self.wrap_kind = _WRAP1
        else:
            self.sum_h += abs(delta1)
            if self.sum_h + ud + 1 >= 0xFFFF:
                self.sum_h -= 0x10000
            self.sum_l += -1 if delta1 <= 0 else 1
            self.count += 1
            if self.count == 64:
                self.count = 32
                self.sum_h = ((self.sum_h - ud) >> 1) - 1
                self.sum_l = _java_div(self.sum_l, 2)
                if self.sum_l % 2 != 0:
                    self.sum_l -= 1
            self.hunit = _norm_hunit(
                _java_div(ud + self.sum_h + 1, self.count + 1))
            self.wrap_kind = _WRAP0
            if self.hunit > 0:
                self.enc = _HYBRID
            else:
                self.enc = _LEN
                if self.sum_l <= 0:
                    self.wrap_kind = _WRAP2


class _BitSink:
    """MSB-first bit accumulator.  Bits collect in an int window and
    flush to the byte buffer whole bytes at a time — the per-bit
    append loop dominated encode_tile's profile before."""

    __slots__ = ("buf", "cur", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        cur = (self.cur << n) | val
        nb = self.nbits + n
        buf = self.buf
        while nb >= 8:
            nb -= 8
            buf.append((cur >> nb) & 0xFF)
        self.cur = cur & ((1 << nb) - 1)
        self.nbits = nb

    def put(self, bit: int) -> None:
        self.write(1 if bit else 0, 1)

    def bin(self, val: int, nbits: int) -> None:
        # unsigned, MSB first (DEMTile.writeValAsBin)
        if nbits == 0:
            return
        if val >= 1 << nbits:
            raise ValueError(f"{val} needs more than {nbits} bits")
        self.write(val, nbits)

    def zeros_then_one(self, n: int) -> None:
        self.write(1, n + 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append((self.cur << (8 - self.nbits)) & 0xFF)
        return bytes(out)


class _BitSource:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def get(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def bin(self, nbits: int) -> int:
        # one int.from_bytes over the covered bytes instead of a
        # per-bit loop
        if nbits == 0:
            return 0
        pos = self.pos
        end = pos + nbits
        b0 = pos >> 3
        b1 = (end + 7) >> 3
        chunk = int.from_bytes(self.data[b0:b1], "big")
        v = (chunk >> ((b1 << 3) - end)) & ((1 << nbits) - 1)
        self.pos = end
        return v

    def count_zeros(self) -> int:
        # scan whole bytes; inside a byte, bit_length finds the first 1
        data = self.data
        pos = self.pos
        n = 0
        while True:
            rem = 8 - (pos & 7)
            window = data[pos >> 3] & ((1 << rem) - 1)
            if window:
                z = rem - window.bit_length()
                self.pos = pos + z + 1
                return n + z
            n += rem
            pos += rem


def analyze_tile(real_heights) -> Tuple[int, int, int, bool]:
    """Header derivation: (base, max_delta, encoding_type, has_data)
    per DEMTile's constructor (DEMTile.java:83-117): voids force
    encoding type 2 and reserve the top normalized value."""
    lo, hi, voids = None, None, 0
    for h in real_heights:
        if h == UNDEF:
            voids += 1
        else:
            if lo is None or h < lo:
                lo = h
            if hi is None or h > hi:
                hi = h
    if lo is None:
        return 0, 0, 2, False
    if voids:
        return lo, hi + 1 - lo, 2, True
    return lo, hi - lo, 0, True


class _TileState:
    """State shared by both codec directions: the three predicters plus
    the sticky plateau table position."""

    def __init__(self, max_delta: int):
        self.std = _Predicter(_STD, max_delta)
        self.pzero = _Predicter(_PLAT_ZERO, max_delta)
        self.pnon = _Predicter(_PLAT_NONZERO, max_delta)
        self.table_pos = 0
        self.cur_kind: Optional[int] = None

    def follower_max_zero(self, p: _Predicter) -> int:
        # DEMTile.ValPredicter.getCurrentMaxZeroBits: plateau followers
        # shrink the valid zero run by the current table's bin width.
        if self.cur_kind in (_PLAT_ZERO, _PLAT_NONZERO):
            return p.max_zero - _PLATEAU_BITS[self.table_pos]
        return p.max_zero


def _predict_std(h_left: int, h_up: int, h_upleft: int, max_delta: int) -> int:
    diff_up = h_up - h_upleft
    if diff_up >= max_delta - h_left:
        return -1
    if diff_up <= -h_left:
        return 0
    return h_left + diff_up


def _neighbors(norm: List[int], width: int, n: int, m: int) -> int:
    """Height at (col n, row m) with the reference's virtual border:
    row -1 is all zero; col -1 mirrors the previous row's first value."""
    if m < 0:
        return 0
    if n < 0:
        return 0 if m == 0 else norm[(m - 1) * width]
    return norm[m * width + n]


def encode_tile(real_heights, width: int, height: int):
    """Encode one tile; returns (base, max_delta, encoding_type,
    bitstream bytes).  Bit-exact to DEMTile.createBitStream."""
    base, max_delta, enc_type, has_data = analyze_tile(real_heights)
    if not has_data or max_delta == 0:
        return base, max_delta, enc_type, b""

    norm = [max_delta if h == UNDEF else h - base for h in real_heights]
    st = _TileState(max_delta)
    sink = _BitSink()
    big_bits = _big_bin_bits(max_delta)

    def emit(p: _Predicter, delta2: int, max_zero: int) -> None:
        if p.enc == _HYBRID:
            hunit = p.hunit
            nbits = hunit.bit_length() - 1
            if delta2 > 0:
                bin_part = (delta2 - 1) % hunit
                len_part = (delta2 - 1 - bin_part) // hunit
            else:
                bin_part = -delta2 % hunit
                len_part = (-delta2 - bin_part) // hunit
            if len_part <= max_zero:
                sink.zeros_then_one(len_part)
                sink.bin(bin_part, nbits)
                sink.put(1 if delta2 > 0 else 0)
                return
        else:
            if delta2 < 0:
                n0 = -delta2 * 2
            elif delta2 > 0:
                n0 = (delta2 - 1) * 2 + 1
            else:
                n0 = 0
            if n0 <= max_zero:
                sink.zeros_then_one(n0)
                return
        # escape: invalid zero run, then signed big binary
        sink.zeros_then_one(max_zero + 1)
        if delta2 < 0:
            sink.bin(-delta2 - 1, big_bits - 1)
        else:
            sink.bin(delta2 - 1, big_bits - 1)
        sink.put(1 if delta2 <= 0 else 0)

    def write_plateau_len(p_len: int, col: int) -> None:
        # DEMTile.writePlateauLen: unary units from the sticky table,
        # then (unless the run hits the row edge) a separator and a
        # binary remainder.
        length, x = p_len, col
        if col + p_len >= width:
            while x < width:
                unit = _PLATEAU_UNIT[st.table_pos]
                st.table_pos += 1
                length -= unit
                x += unit
                sink.put(1)
            if x != width:
                st.table_pos -= 1
            return
        while True:
            unit = _PLATEAU_UNIT[st.table_pos]
            if length < unit:
                break
            st.table_pos += 1
            length -= unit
            sink.put(1)
            x += unit
            if x > width:
                st.table_pos -= 1
            if x >= width:
                return
        if st.table_pos > 0:
            st.table_pos -= 1
        sink.put(0)
        nbits = _PLATEAU_BITS[st.table_pos]
        if nbits > 0:
            sink.bin(abs(length), nbits)

    pos = 0
    total = width * height
    follower = False
    while pos < total:
        n, m = pos % width, pos // width
        h_up = _neighbors(norm, width, n, m - 1)
        h_left = _neighbors(norm, width, n - 1, m)
        ddiff = h_up - h_left
        if follower:
            p = st.pzero if ddiff == 0 else st.pnon
            follower = False
        elif ddiff == 0:
            st.cur_kind = None
            run = 0
            while n + run < width and norm[m * width + n + run] == h_left:
                run += 1
            write_plateau_len(run, n)
            pos += run
            follower = (pos % width != 0) or run == 0
            continue
        else:
            p = st.std
        st.cur_kind = p.kind
        p.ddiff = ddiff
        h = norm[m * width + n]
        if p.kind == _STD:
            predict = _predict_std(
                h_left, h_up, _neighbors(norm, width, n - 1, m - 1),
                max_delta)
            v = (predict - h) if ddiff > 0 else (h - predict)
        else:
            v = h - h_up
        delta1 = p.delta1_of_wrapped(p.wrap(v))
        emit(p, p.delta2_of_delta1(delta1), st.follower_max_zero(p))
        p.process(delta1)
        pos += 1

    return base, max_delta, enc_type, sink.bytes()


def decode_tile(stream: bytes, base: int, max_delta: int, enc_type: int,
                width: int, height: int):
    """Invert :func:`encode_tile`: rebuild the real height matrix from
    the bit stream and header fields.  The mode decisions are re-derived
    from the same predicter state the encoder maintained."""
    total = width * height
    if max_delta == 0:
        # enc_type 2 with a zero delta can only be the all-void tile
        # (any surviving valid value beside a void forces delta >= 1);
        # enc_type 0 with zero delta is a constant tile at `base`.
        return [UNDEF] * total if enc_type == 2 else [base] * total

    norm = [0] * total
    st = _TileState(max_delta)
    src = _BitSource(stream)
    big_bits = _big_bin_bits(max_delta)

    def read_value(p: _Predicter, max_zero: int) -> int:
        zeros = src.count_zeros()
        if zeros > max_zero:
            mag = src.bin(big_bits - 1)
            neg = src.get()
            return -(mag + 1) if neg else mag + 1
        if p.enc == _HYBRID:
            hunit = p.hunit
            nbits = hunit.bit_length() - 1
            bin_part = src.bin(nbits)
            positive = src.get()
            if positive:
                return zeros * hunit + bin_part + 1
            return -(zeros * hunit + bin_part)
        n0 = zeros
        if n0 == 0:
            return 0
        if n0 % 2:
            return (n0 - 1) // 2 + 1
        return -(n0 // 2)

    def read_plateau_len(col: int):
        length, x = 0, col
        while True:
            if x >= width:
                if x != width:
                    st.table_pos -= 1
                return width - col, True
            if src.get() == 1:
                unit = _PLATEAU_UNIT[st.table_pos]
                st.table_pos += 1
                length += unit
                x += unit
                continue
            if st.table_pos > 0:
                st.table_pos -= 1
            nbits = _PLATEAU_BITS[st.table_pos]
            rem = src.bin(nbits) if nbits > 0 else 0
            return length + rem, False

    pos = 0
    follower = False
    while pos < total:
        n, m = pos % width, pos // width
        h_up = _neighbors(norm, width, n, m - 1)
        h_left = _neighbors(norm, width, n - 1, m)
        ddiff = h_up - h_left
        if follower:
            p = st.pzero if ddiff == 0 else st.pnon
            follower = False
        elif ddiff == 0:
            st.cur_kind = None
            run, _hit_edge = read_plateau_len(n)
            for i in range(run):
                norm[m * width + n + i] = h_left
            pos += run
            follower = (pos % width != 0) or run == 0
            continue
        else:
            p = st.std
        st.cur_kind = p.kind
        p.ddiff = ddiff
        delta2 = read_value(p, st.follower_max_zero(p))
        delta1 = p.delta1_of_delta2(delta2)
        wrapped = p.wrapped_of_delta1(delta1)
        if p.kind == _STD:
            predict = _predict_std(
                h_left, h_up, _neighbors(norm, width, n - 1, m - 1),
                max_delta)
            # un-wrap: exactly one candidate puts h back in range
            h = None
            for cand in (wrapped, wrapped + max_delta + 1,
                         wrapped - (max_delta + 1)):
                hh = (predict - cand) if ddiff > 0 else (cand + predict)
                if 0 <= hh <= max_delta:
                    h = hh
                    break
        else:
            h = None
            for cand in (wrapped, wrapped + max_delta + 1,
                         wrapped - (max_delta + 1)):
                hh = h_up + cand
                if 0 <= hh <= max_delta:
                    h = hh
                    break
        if h is None:
            raise ValueError("corrupt DEM bit stream: no in-range height")
        norm[m * width + n] = h
        p.process(delta1)
        pos += 1

    if enc_type == 2:
        return [UNDEF if v == max_delta else base + v for v in norm]
    return [base + v for v in norm]
