"""Garmin NET house-number interval bit-stream codec.

The reference encodes the per-node house-number intervals of a road
into a compact little-endian-bit stream (command 1 = numbers follow,
0 = numbering-style change, 2 = temporary bit-width change, 6 = node
skip), with all numbers expressed as differences from a running base
value through two configurable variable-width bit writers (start
diffs, end diffs).  This module is the bit-exact re-expression:

- ``BitWriter`` / ``BitReader``  — imgfmt/app/BitWriter.java:26-190,
  imgfmt/app/BitReader.java:24-132 (LSB-first bit order, ``sputn`` /
  ``sget2`` extended-range signed fields).
- ``VarBitWriter`` / ``VarBitReader`` — the configurable-width field
  writers of imgfmt/app/net/NumberPreparer.java:798-869 and the
  test-lib reader (test/func/lib/NumberReader.java:444-475).
- ``NumberPreparer`` — the two-phase (gather widths, then write)
  encoder of imgfmt/app/net/NumberPreparer.java:38-782 including the
  base-equalisation, default-end-diff and style-swap economies.
- ``NumberReader`` — the decoder, derived from
  test/func/lib/NumberReader.java:40-439 (itself the only published
  reader of the format); used by the round-trip tests and available
  for reading NET numbering streams.

This is a per-road kernel: on the Spark side it runs inside an
Arrow-batched function over the housenumber interval lists produced
by ``operators.housenumbers`` — there is no shuffle, no driver state,
and road streams are independent, so it scales with the road count.
"""
from __future__ import annotations

from typing import List, Optional

# Numbering styles (imgfmt/app/net/NumberStyle.java)
NONE, EVEN, ODD, BOTH = "N", "E", "O", "B"
_STYLE_VAL = {NONE: 0, EVEN: 1, ODD: 2, BOTH: 3}
_STYLE_FROM_VAL = {v: k for k, v in _STYLE_VAL.items()}

# Width minimums for the start/end diff fields (NumberPreparer.java:44-45)
START_WIDTH_MIN = 5
END_WIDTH_MIN = 2


def style_from_char(c: str) -> str:
    """NumberStyle.fromChar — '0' is tolerated as ODD."""
    if c[:1] in (NONE, EVEN, ODD, BOTH):
        return c[0]
    if c[:1] == "0":
        return ODD
    return NONE


def style_round(style: str, val: int, direction: int) -> int:
    """NumberStyle.round — nudge val onto the side's parity."""
    if style == EVEN and (val & 1) == 1:
        return val + direction
    if style == ODD and (val & 1) == 0:
        return val + direction
    return val


class Abandon(RuntimeError):
    """Raised when a range cannot be encoded (NumberPreparer.java:878)."""

    def __init__(self, message: str):
        super().__init__("HOUSE NUMBER RANGE: " + message)


def _bit_len(n: int) -> int:
    """32 - Integer.numberOfLeadingZeros(n) for non-negative n."""
    return n.bit_length()


class BitWriter:
    """LSB-first bit stream writer (imgfmt/app/BitWriter.java)."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._bitoff = 0

    def put1(self, b: bool) -> None:
        off = self._bitoff >> 3
        if off >= len(self._buf):
            self._buf.append(0)
        if b:
            self._buf[off] |= 1 << (self._bitoff & 7)
        self._bitoff += 1

    def putn(self, bval: int, nb: int) -> None:
        """Write the low nb bits of bval, LSB first (putn:83-112)."""
        if nb >= 24:
            raise ValueError("putn limited to fewer than 24 bits")
        val = bval & ((1 << nb) - 1)
        n = nb
        while n > 0:
            ind = self._bitoff >> 3
            rem = self._bitoff & 7
            if ind >= len(self._buf):
                self._buf.append(0)
            self._buf[ind] |= (val << rem) & 0xFF
            val >>= 8 - rem
            nput = min(8 - rem, n)
            self._bitoff += nput
            n -= nput

    def sputn(self, bval: int, nb: int) -> None:
        """Signed value with 1<<(nb-1) as the extended-range flag."""
        top = 1 << (nb - 1)
        mask = top - 1
        val = abs(bval)
        while val > mask:
            self.putn(top, nb)
            val -= mask
        if bval < 0:
            self.putn((top - val) | top, nb)
        else:
            self.putn(val, nb)

    def get_bytes(self) -> bytes:
        return bytes(self._buf)

    @property
    def bit_position(self) -> int:
        return self._bitoff

    @property
    def length(self) -> int:
        """Bytes used to hold the stream (getLength:146-148)."""
        return (self._bitoff + 7) // 8


class BitReader:
    """LSB-first bit stream reader (imgfmt/app/BitReader.java)."""

    def __init__(self, buf: bytes) -> None:
        self._buf = buf
        self.bit_position = 0

    def get1(self) -> bool:
        off = self.bit_position & 7
        b = self._buf[self.bit_position >> 3]
        self.bit_position += 1
        return (b >> off) & 1 == 1

    def get(self, n: int) -> int:
        res = 0
        pos = 0
        while pos < n:
            index = self.bit_position >> 3
            off = self.bit_position & 7
            nbits = min(n - pos, 8 - off)
            mask = (1 << nbits) - 1
            res |= ((self._buf[index] >> off) & mask) << pos
            pos += nbits
            self.bit_position += nbits
        return res

    def sget(self, n: int) -> int:
        """Signed field: the top bit of the n-bit field is the sign."""
        res = self.get(n)
        top = 1 << (n - 1)
        if res & top:
            res = ~(top - 1) | res
        return res

    def sget2(self, n: int) -> int:
        """Signed with extended range: 1<<(n-1) means read another."""
        top = 1 << (n - 1)
        mask = top - 1
        base = 0
        res = self.get(n)
        while res == top:
            base += mask
            res = self.get(n)
        if res & top == 0:
            return res + base
        return (res | ~mask) - base

    @property
    def number_of_bits(self) -> int:
        return len(self._buf) * 8


class VarBitWriter:
    """Configurable-width field writer (NumberPreparer.java:798-869).

    ``negative``: every value is negative, stored positive, no sign
    bit.  ``signed``: mixed signs, one extra sign bit.  The width is
    stored as a difference from a well-known minimum.
    """

    def __init__(self, bw: BitWriter, min_width: int,
                 negative: bool = False, signed: bool = False,
                 width: int = 0) -> None:
        self.bw = bw
        self.min_width = min_width
        self.negative = negative
        self.signed = signed
        self.bit_width = width - min_width if width > min_width else 0

    def write(self, n: int) -> None:
        if not self.check_fit(n):
            raise Abandon("number does not fit bit space available")
        if n < 0 and self.negative:
            n = -n
        if self.signed:
            n &= (1 << (self.min_width + self.bit_width + 2)) - 1
        self.bw.putn(n, self.min_width + self.bit_width + (1 if self.signed else 0))

    def check_fit(self, n: int) -> bool:
        if self.negative:
            if n > 0:
                return False
            n = -n
        elif self.signed and n < 0:
            n = -1 - n
        mask = (1 << (self.min_width + self.bit_width)) - 1
        return n == (n & mask)

    def write_format(self) -> None:
        self.bw.put1(self.negative)
        self.bw.put1(self.signed)
        self.bw.putn(self.bit_width, 4)


class VarBitReader:
    """Reads the field format then values (NumberReader.java:444-475)."""

    def __init__(self, br: BitReader, off: int) -> None:
        self.br = br
        self.off = off
        self.negative = br.get1()
        self.signed = br.get1()
        self.width = br.get(4)

    def read(self) -> int:
        if self.signed:
            val = self.br.sget(self.width + self.off + 1)
        else:
            val = self.br.get(self.width + self.off)
        return -val if self.negative else val


class NumberSpec:
    """One node's interval record, polish-format spec string form.

    Mirrors imgfmt/app/net/Numbers.java:80-297 far enough for the
    codec: node number, per-side (style, start, end) where a side set
    to (N,-1,-1) is absent, spec parse + canonical ``to_spec`` string
    (the reference compares Numbers by their toString).
    """

    def __init__(self, spec: Optional[str] = None) -> None:
        self.node = 0
        self.index: Optional[int] = None
        self.left_style, self.left_start, self.left_end = NONE, -1, -1
        self.right_style, self.right_start, self.right_end = NONE, -1, -1
        if spec is not None:
            f = spec.split(",")
            self.node = int(f[0])
            self.set_numbers(True, style_from_char(f[1]), int(f[2]), int(f[3]))
            self.set_numbers(False, style_from_char(f[4]), int(f[5]), int(f[6]))

    def set_numbers(self, left: bool, style: str, start: int, end: int) -> None:
        # style NONE with -1,-1 leaves the side absent (setNumbers:130-140)
        if style == NONE and start == -1 and end == -1:
            style, start, end = NONE, -1, -1
        if left:
            self.left_style, self.left_start, self.left_end = style, start, end
        else:
            self.right_style, self.right_start, self.right_end = style, start, end

    def get_index(self) -> int:
        return self.node if self.index is None else self.index

    def has_index(self) -> bool:
        return self.index is not None

    def to_spec(self) -> str:
        if self.node > 0:
            node_str = str(self.node)
        elif self.get_index() > 0:
            node_str = "(n%d)" % self.get_index()
        else:
            node_str = "0"
        return "%s,%s,%d,%d,%s,%d,%d" % (
            node_str, self.left_style, self.left_start, self.left_end,
            self.right_style, self.right_start, self.right_end)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, NumberSpec) and self.to_spec() == other.to_spec()

    def __repr__(self) -> str:  # pragma: no cover
        return "NumberSpec(%s)" % self.to_spec()


class _Side:
    """One side of the road (NumberPreparer.Side, :434-549)."""

    def __init__(self, left: bool) -> None:
        self.left = left
        self.style = NONE
        self.base = 0
        self.end = 0
        self.target_style = NONE
        self.target_start = 0
        self.target_end = 0
        self.start_diff = 0
        self.end_diff = 0
        self.last_end_diff = 0
        self.direction = 1
        self.equalized = False

    def set_targets(self, style: str, start: int, end: int) -> None:
        self.target_style = style
        self.target_start = start
        self.target_end = end
        self.direction = -1 if end < start else 1

    def try_start(self, value: int) -> bool:
        return (value == self.target_start
                or style_round(self.style, value, self.direction) == self.target_start)

    def need_override(self, left: "_Side") -> bool:
        return self.end_diff != 0 or left.end_diff == 0

    def calc(self, other: "_Side") -> None:
        if self.style == NONE:
            return
        equalized = self.equalized or other.equalized
        if not equalized:
            self.start_diff = 0 if self.try_start(self.base) else self.target_start - self.base
        self.end_diff = self.target_end - (self.base + self.start_diff) + self.direction

        # start == end can often do without an end diff (calc:524-527)
        if (self.target_start == self.target_end and self.base == self.target_start
                and self.last_end_diff == 0 and not equalized):
            if self.left or other.end_diff == 0:
                self.end_diff = 0

        self.end = self.base + self.start_diff + self.end_diff

        if self.left:
            if self.end_diff == self.last_end_diff:
                self.end_diff = 0
        elif other.style != NONE:
            if other.end_diff == 0 and self.end_diff == self.last_end_diff:
                self.end_diff = 0
            if other.end_diff != 0 and other.end_diff == self.end_diff:
                self.end_diff = 0

    def finish(self) -> None:
        self.last_end_diff = self.end - (self.base + self.start_diff)
        self.base = self.end


class _State:
    """Shared gather/write state machine (NumberPreparer.State)."""

    def __init__(self) -> None:
        self.left = _Side(True)
        self.right = _Side(False)
        self.left.style = ODD
        self.right.style = EVEN
        self.initial_value = 0

    def set_initial_value(self, val: int) -> None:
        self.initial_value = val
        self.left.base = val
        self.right.base = val

    def set_target(self, numbers: NumberSpec) -> None:
        self.left.set_targets(numbers.left_style, numbers.left_start, numbers.left_end)
        self.right.set_targets(numbers.right_style, numbers.right_start, numbers.right_end)

    def write_numbering_style(self, bw: BitWriter) -> None:
        pass

    def write_bit_widths(self, bw: BitWriter) -> None:
        pass

    def write_skip(self, bw: BitWriter, n: int) -> None:
        pass

    def calc_numbers(self) -> None:
        if self.left.style == NONE:
            self.left.base = self.right.base
        self._equalize_bases()
        self.left.calc(self.right)
        self.right.calc(self.left)

    def _equalize_bases(self) -> bool:
        """Try to set both bases equal at zero bit cost (:313-343)."""
        left, right = self.left, self.right
        left.equalized = right.equalized = False
        if left.direction != right.direction:
            return False

        diff = left.target_start - left.base
        if left.try_start(left.base):
            diff = 0
        if right.try_start(left.base + diff):
            left.equalized = True
            right.base = left.base
            left.start_diff = right.start_diff = diff
            return True

        diff = right.target_start - right.base
        if left.try_start(right.base + diff):
            right.equalized = True
            left.base = right.base
            left.start_diff = right.start_diff = diff
            return True
        return False

    def write_numbers(self, bw: BitWriter) -> None:
        """Emit one 'numbers follow' command (writeNumbers:353-407)."""
        left, right = self.left, self.right
        do_single_side = left.style == NONE or right.style == NONE

        bw.put1(True)  # command 1

        equalized = False
        if not do_single_side:
            equalized = left.equalized or right.equalized
            bw.put1(equalized)
            if equalized:
                bw.put1(left.equalized)

        if not do_single_side:
            bw.put1(not right.need_override(left))

        first_side = left
        if do_single_side and left.style == NONE:
            first_side = right

        do_start = first_side.start_diff != 0
        do_end = first_side.end_diff != 0
        bw.put1(not do_start)
        bw.put1(not do_end)

        if do_start:
            self.write_start(first_side.start_diff)
        if do_end:
            self.write_end(first_side.end_diff)

        first_side.finish()

        if do_single_side:
            left.base = right.base = first_side.base
            left.last_end_diff = right.last_end_diff = first_side.last_end_diff
            return

        do_start = right.start_diff != 0
        do_end = right.end_diff != 0

        if not equalized:
            bw.put1(not do_start)
        if right.need_override(left):
            bw.put1(not do_end)

        if do_start and not equalized:
            self.write_start(right.start_diff)
        if do_end:
            self.write_end(right.end_diff)

        right.finish()

    def restore_writers(self) -> None:
        pass

    def write_start(self, diff: int) -> None:
        raise NotImplementedError

    def write_end(self, diff: int) -> None:
        raise NotImplementedError

    def get_start_writer(self) -> VarBitWriter:
        raise NotImplementedError

    def get_end_writer(self) -> VarBitWriter:
        raise NotImplementedError

    def swap_defaults(self) -> None:
        self.left.style = EVEN
        self.right.style = ODD


class _BitSizes:
    """Width/sign bookkeeping for one field (GatheringState.BitSizes)."""

    def __init__(self) -> None:
        self.positive = False
        self.negative = False
        self.diff = 0

    @property
    def is_signed(self) -> bool:
        return self.positive and self.negative

    def calc_width(self) -> int:
        n = self.diff
        if self.is_signed:
            n += 1
        return _bit_len(n)


class _GatheringState(_State):
    """First pass: find the field widths without writing (:558-654)."""

    def __init__(self, preparer: "NumberPreparer", initial_value: int) -> None:
        super().__init__()
        self._preparer = preparer
        self.start = _BitSizes()
        self.end = _BitSizes()
        self.set_initial_value(initial_value)

    def write_numbering_style(self, bw: BitWriter) -> None:
        self.left.style = self.left.target_style
        self.right.style = self.right.target_style

    def write_start(self, diff: int) -> None:
        val = self._test_sign(self.start, diff)
        if val > self.start.diff:
            self.start.diff = val

    def write_end(self, diff: int) -> None:
        val = self._test_sign(self.end, diff)
        if val > self.end.diff:
            self.end.diff = val

    @staticmethod
    def _test_sign(bs: _BitSizes, val: int) -> int:
        if val > 0:
            bs.positive = True
        elif val < 0:
            bs.negative = True
            return -val
        return val

    def get_start_writer(self) -> VarBitWriter:
        return self._get_var_bit_writer(self.start, START_WIDTH_MIN)

    def get_end_writer(self) -> VarBitWriter:
        return self._get_var_bit_writer(self.end, END_WIDTH_MIN)

    def _get_var_bit_writer(self, bs: _BitSizes, min_width: int) -> VarBitWriter:
        writer = VarBitWriter(self._preparer.bw, min_width)
        if bs.is_signed:
            writer.signed = True
        elif bs.negative:
            writer.negative = True
        width = bs.calc_width()
        if width > min_width:
            writer.bit_width = width - min_width
        if writer.bit_width > 15:
            raise Abandon("Difference too large")
        return writer


class _WritingState(_State):
    """Second pass: emit the actual bit stream (:660-782)."""

    def __init__(self, state: _State) -> None:
        super().__init__()
        self.set_initial_value(state.initial_value)
        self.start_writer = state.get_start_writer()
        self.end_writer = state.get_end_writer()
        self._saved_start_writer = self.start_writer
        self._saved_end_writer = self.end_writer
        self._restore = False

    def write_start(self, diff: int) -> None:
        self.start_writer.write(diff)

    def write_end(self, diff: int) -> None:
        self.end_writer.write(diff)

    def write_numbering_style(self, bw: BitWriter) -> None:
        if (self.left.target_style != self.left.style
                or self.right.target_style != self.right.style):
            bw.putn(0, 2)  # command 0
            bw.putn(_STYLE_VAL[self.left.target_style], 2)
            bw.putn(_STYLE_VAL[self.right.target_style], 2)
            self.left.style = self.left.target_style
            self.right.style = self.right.target_style

    def write_bit_widths(self, bw: BitWriter) -> None:
        self._new_writer(bw, self.start_writer, self.left.start_diff,
                         self.right.start_diff, True)
        self._new_writer(bw, self.end_writer, self.left.end_diff,
                         self.right.end_diff, False)

    def _new_writer(self, bw: BitWriter, writer: VarBitWriter,
                    left_diff: int, right_diff: int, start: bool) -> None:
        """Switch to a temporary wider/resigned writer (:718-744)."""
        if writer.check_fit(left_diff) and writer.check_fit(right_diff):
            return
        lo, hi = min(left_diff, right_diff), max(left_diff, right_diff)
        signed = False
        negative = False
        if hi < 0:
            negative = True
        elif lo < 0:
            signed = True
        val = max(abs(lo), abs(hi))
        width = _bit_len(val)
        if signed:
            width += 1

        self._restore = True
        if start:
            nw = VarBitWriter(bw, START_WIDTH_MIN, negative, signed, width)
            self.start_writer = nw
            bw.putn(2, 4)  # change width start
        else:
            nw = VarBitWriter(bw, END_WIDTH_MIN, negative, signed, width)
            self.end_writer = nw
            bw.putn(0xA, 4)  # change width end
        nw.write_format()

    def write_skip(self, bw: BitWriter, n: int) -> None:
        if n < 0:
            raise Abandon("bad skip value:%d" % n)
        bw.putn(6, 3)  # command 6
        width = _bit_len(n)
        if width > 5:
            bw.put1(True)
            width = 10
        else:
            bw.put1(False)
            width = 5
        bw.putn(n, width)

    def get_start_writer(self) -> VarBitWriter:
        return self.start_writer

    def get_end_writer(self) -> VarBitWriter:
        return self.end_writer

    def restore_writers(self) -> None:
        if self._restore:
            self.start_writer = self._saved_start_writer
            self.end_writer = self._saved_end_writer
            self._restore = False


class NumberPreparer:
    """Compile a road's interval list into the NET numbering stream.

    Two-pass: a gathering pass sizes the diff fields, the writing pass
    emits the stream (NumberPreparer.java:38-241).  ``numbers`` is
    filtered in place of NONE/NONE entries, mirroring setup():119-123.
    """

    def __init__(self, numbers: List[NumberSpec]) -> None:
        self.numbers = numbers
        self.valid = False
        self.swapped_default_style = False
        self.bw: Optional[BitWriter] = None

    def fetch_bit_stream(self) -> BitWriter:
        if self.bw is not None:
            return self.bw
        self.bw = BitWriter()
        try:
            initial_value = self._setup()
            state: _State = _GatheringState(self, initial_value)
            self._process(BitWriter(), state)

            # initial block: field formats then the initial base value
            state.get_start_writer().write_format()
            state.get_end_writer().write_format()
            self._write_initial_value(state)

            state = _WritingState(state)
            self._process(self.bw, state)

            if self.bw.length > 1:
                self.valid = True
        except Abandon:
            self.valid = False
        return self.bw

    def is_valid(self) -> bool:
        try:
            self.fetch_bit_stream()
        except Exception:
            pass
        return self.valid

    def get_swapped(self) -> bool:
        return self.swapped_default_style

    def _setup(self) -> int:
        self.numbers[:] = [n for n in self.numbers
                           if not (n.left_style == NONE and n.right_style == NONE)]
        if not self.numbers:
            raise Abandon("no numbers")

        first = self.numbers[0]
        if first.left_style == EVEN and first.right_style == ODD:
            self.swapped_default_style = True

        initial = first.left_start if first.left_style != NONE else 0
        right_start = first.right_start if first.right_style != NONE else 0
        if initial == 0:
            initial = right_start
        if first.left_start > first.left_end or first.right_start > first.right_end:
            initial = max(initial, right_start)
        elif right_start > 0:
            initial = min(initial, right_start)
        return initial

    def _process(self, bw: BitWriter, state: _State) -> None:
        if self.swapped_default_style:
            state.swap_defaults()
        last_node = -1
        for n in self.numbers:
            if not n.has_index():
                raise Abandon("no r node set")
            if n.get_index() != last_node + 1:
                state.write_skip(bw, n.get_index() - last_node - 2)
            state.set_target(n)
            state.write_numbering_style(bw)
            state.calc_numbers()
            state.write_bit_widths(bw)
            state.write_numbers(bw)
            state.restore_writers()
            last_node = n.get_index()

    def _write_initial_value(self, state: _State) -> None:
        assert state.initial_value >= 0, "initial value is not positive"
        width = _bit_len(state.initial_value)
        if width > 20:
            raise Abandon("Initial value too large: %d" % state.initial_value)
        if width > 5:
            self.bw.put1(False)
            self.bw.putn(width - 5, 4)
        else:
            self.bw.put1(True)
            width = 5
        self.bw.putn(state.initial_value, width)


class NumberException(RuntimeError):
    pass


class NumberReader:
    """Decode a numbering bit stream back to interval records.

    Derived from the reference's only published reader of the format,
    test/func/lib/NumberReader.java:40-439.
    """

    def __init__(self, br: BitReader) -> None:
        self.br = br
        self.start_reader: Optional[VarBitReader] = None
        self.end_reader: Optional[VarBitReader] = None
        self._saved_start: Optional[VarBitReader] = None
        self._saved_end: Optional[VarBitReader] = None
        self._do_restore = False
        self.left_base = 0
        self.right_base = 0
        self.left_style = ODD
        self.right_style = EVEN
        self.left_start = self.right_start = 0
        self.left_end = self.right_end = 0
        self.left_last_end_diff = 0
        self.right_last_end_diff = 0
        self.node_counter = 0
        self.number_of_nodes = 0

    def set_number_of_nodes(self, n: int) -> None:
        self.number_of_nodes = n

    def read_numbers(self, swap: bool) -> List[NumberSpec]:
        if swap:
            self.left_style = EVEN
            self.right_style = ODD

        self.start_reader = VarBitReader(self.br, 5)
        self.end_reader = VarBitReader(self.br, 2)
        self._get_initial_base()

        numbers: List[NumberSpec] = []
        while self.node_counter < self.number_of_nodes:
            try:
                self._run_command(numbers)
            except (NumberException, IndexError):
                return numbers
        return numbers

    def _run_command(self, numbers: List[NumberSpec]) -> None:
        cmd = self._read_command()
        if cmd == 0:
            self.left_style = _STYLE_FROM_VAL[self.br.get(2)]
            self.right_style = _STYLE_FROM_VAL[self.br.get(2)]
        elif cmd == 1:
            self._fetch_numbers(numbers)
        elif cmd == 2:
            self._use_bits()
        elif cmd == 6:
            self._skip_nodes()
        else:
            raise NumberException("unimplemented command: %d" % cmd)

    def _read_command(self) -> int:
        cmd = 0
        if self.br.get1():
            cmd |= 0x1
        elif self.br.get1():
            cmd |= 0x2
            if self.br.get1():
                cmd |= 0x4
        return cmd

    def _use_bits(self) -> None:
        if not self._do_restore:
            self._saved_start = self.start_reader
            self._saved_end = self.end_reader
        self._do_restore = True
        if self.br.get1():
            self.end_reader = VarBitReader(self.br, 2)
        else:
            self.start_reader = VarBitReader(self.br, 5)

    def _skip_nodes(self) -> None:
        if self.br.get1():
            skip = 1 + self.br.get(10)
        else:
            skip = 1 + self.br.get(5)
        self.node_counter += skip

    def _fetch_numbers(self, numbers: List[NumberSpec]) -> None:
        do_single_side = self.left_style == NONE or self.right_style == NONE
        if self.left_style == NONE:
            self.left_base = self.right_base

        do_same_base = False
        if not do_single_side:
            do_same_base = self.br.get1()
            if do_same_base:
                if self.br.get1():
                    self.right_base = self.left_base
                else:
                    self.left_base = self.right_base

        do_right_override = False
        if not do_single_side:
            do_right_override = not self.br.get1()
        do_read_start = not self.br.get1()
        do_read_end = not self.br.get1()

        start_diff, end_diff = 0, self.left_last_end_diff
        if do_read_start:
            start_diff = self.start_reader.read()
        if do_read_end:
            end_diff = self.end_reader.read()

        self.left_start = self.left_base + start_diff
        self.left_end = self.left_start + end_diff
        self.left_base = self.left_end
        self.left_last_end_diff = end_diff

        if do_single_side:
            self._read_single_side(numbers)
            self._restore_readers()
            return

        if not do_same_base:
            start_diff = 0
        if do_right_override or not do_read_end:
            end_diff = self.right_last_end_diff

        do_read_start = False
        do_read_end = False
        if not do_same_base:
            do_read_start = not self.br.get1()
        if do_right_override:
            do_read_end = not self.br.get1()
        if do_read_start:
            start_diff = self.start_reader.read()
        if do_read_end:
            end_diff = self.end_reader.read()

        self.right_start = self.right_base + start_diff
        self.right_end = self.right_start + end_diff
        self.right_base = self.right_end
        self.right_last_end_diff = end_diff

        self._adjust_values()

        n = NumberSpec()
        n.index = self.node_counter
        n.node = self.node_counter
        n.set_numbers(True, self.left_style, self.left_start, self.left_end)
        n.set_numbers(False, self.right_style, self.right_start, self.right_end)
        numbers.append(n)
        self.node_counter += 1
        self._restore_readers()

    def _read_single_side(self, numbers: List[NumberSpec]) -> None:
        self.right_base = self.left_base
        self.right_start = self.left_start
        self.right_end = self.left_end
        self.right_last_end_diff = self.left_last_end_diff
        self._adjust_values()

        n = NumberSpec()
        n.index = self.node_counter
        n.node = self.node_counter
        if self.left_style == NONE:
            n.set_numbers(False, self.right_style, self.right_start, self.right_end)
        else:
            n.set_numbers(True, self.left_style, self.left_start, self.left_end)
        numbers.append(n)
        self.node_counter += 1

    def _restore_readers(self) -> None:
        if self._do_restore:
            self.start_reader = self._saved_start
            self.end_reader = self._saved_end
            self._do_restore = False

    def _adjust_values(self) -> None:
        """Undo the +direction encoding bias and re-apply parity."""
        ldirection = 1
        if self.left_start < self.left_end:
            self.left_end -= 1
        elif self.left_start > self.left_end:
            self.left_end += 1
            ldirection = -1

        rdirection = 1
        if self.right_start < self.right_end:
            self.right_end -= 1
        elif self.right_start > self.right_end:
            self.right_end += 1
            rdirection = -1

        if self.left_style == EVEN:
            if self.left_start & 1:
                self.left_start += ldirection
            if self.left_end & 1:
                self.left_end -= ldirection
        elif self.left_style == ODD:
            if not self.left_start & 1:
                self.left_start += ldirection
            if not self.left_end & 1:
                self.left_end -= ldirection

        if self.right_style == EVEN:
            if self.right_start & 1:
                self.right_start += rdirection
            if self.right_end & 1:
                self.right_end -= rdirection
        elif self.right_style == ODD:
            if not self.right_start & 1:
                self.right_start += rdirection
            if not self.right_end & 1:
                self.right_end -= rdirection

    def _get_initial_base(self) -> None:
        extra = 0
        if not self.br.get1():
            extra = self.br.get(4)
        self.left_base = self.br.get(5 + extra)
        self.right_base = self.left_base
