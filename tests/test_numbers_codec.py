"""Garmin house-number bit-stream codec tests.

Ports the reference suites:
- test/imgfmt/app/BitReaderTest.java (bit reader + sputn/sget2)
- test/imgfmt/app/net/VarBitWriterTest.java (field writer sign modes)
- test/imgfmt/app/net/NumberPreparerTest.java (write→read round trips,
  known stream, invalid-range detection, regression corpus)
- test/main/NumberRangeTest.java (seeded random range round trips)

No Spark session needed — the codec is a per-road kernel.
"""
import random

import pytest

from mkgmap_spark.functions.numbers_codec import (
    Abandon,
    BitReader,
    BitWriter,
    NumberPreparer,
    NumberReader,
    NumberSpec,
    VarBitWriter,
)


# ------------------------------------------------------------------
# BitReaderTest.java
# ------------------------------------------------------------------

class TestBitReader:
    def test_get_bits(self):
        br = BitReader(bytes([0xF1, 0x73, 0xC2, 0x05]))
        assert br.get1() is True
        assert br.get(5) == 0x18
        assert br.get(4) == 0xF
        assert br.get(16) == 0x709C

    def test_special_negative(self):
        br = BitReader(bytes([0x24, 0x0B]))
        assert br.sget2(3) == -12

    def test_special_negative2(self):
        br = BitReader(bytes([0x2C, 0x00]))
        assert br.sget2(3) == -6

    def test_special_positive(self):
        br = BitReader(bytes([0xA4, 0x00]))
        assert br.sget2(3) == 8

    def test_write_read(self):
        for i in range(-20, 21):
            bw = BitWriter()
            bw.sputn(i, 3)
            br = BitReader(bw.get_bytes())
            assert br.sget2(3) == i


# ------------------------------------------------------------------
# VarBitWriterTest.java
# ------------------------------------------------------------------

class TestVarBitWriter:
    def setup_method(self):
        self.bw = BitWriter()

    def test_positive(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.write(7)
        assert self.bw.get_bytes()[0] == 7

    def test_positive_with_width(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.bit_width = 1
        vbw.write(15)
        assert self.bw.get_bytes()[0] == 15

    def test_positive_with_width_fail(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.bit_width = 1
        with pytest.raises(Abandon):
            vbw.write(16)

    def test_positive_fail(self):
        vbw = VarBitWriter(self.bw, 3)
        with pytest.raises(Abandon):
            vbw.write(8)

    def test_negative(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.negative = True
        vbw.write(-7)
        assert self.bw.get_bytes()[0] == 7

    def test_negative_with_positive(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.negative = True
        with pytest.raises(Abandon):
            vbw.write(7)

    def test_negative_too_big(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.negative = True
        with pytest.raises(Abandon):
            vbw.write(8)

    def test_signed_positive(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.signed = True
        vbw.write(7)
        assert self.bw.get_bytes()[0] == 7

    def test_signed_negative(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.signed = True
        vbw.write(-8)
        assert self.bw.get_bytes()[0] == 0x8

    def test_signed_positive_too_big(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.signed = True
        with pytest.raises(Abandon):
            vbw.write(8)

    def test_signed_negative_too_big(self):
        vbw = VarBitWriter(self.bw, 3)
        vbw.signed = True
        with pytest.raises(Abandon):
            vbw.write(-9)


# ------------------------------------------------------------------
# NumberPreparerTest.java
# ------------------------------------------------------------------

def create_list(specs):
    numbers = []
    for s in specs:
        n = NumberSpec(s)
        n.index = n.node
        numbers.append(n)
    return numbers


def write_and_read(numbers, byte_counter=None):
    preparer = NumberPreparer(numbers)
    bw = preparer.fetch_bit_stream()
    if byte_counter is not None:
        byte_counter.append(bw.length)
    assert preparer.is_valid(), "check valid flag"
    swapped = preparer.get_swapped()

    data = bw.get_bytes()[: bw.length]
    nr = NumberReader(BitReader(data))
    nr.set_number_of_nodes(numbers[-1].get_index() + 1)
    out = nr.read_numbers(swapped)
    for n in out:
        n.node = n.get_index()
    return out


def run(*specs, byte_counter=None):
    nlist = create_list(specs)
    output = write_and_read(nlist, byte_counter)
    assert [n.to_spec() for n in output] == [n.to_spec() for n in nlist]


def run_separate(*specs):
    for s in specs:
        run(s)


class TestNumberPreparer:
    def test_number_constructor(self):
        spec = "0,O,1,7,E,2,12"
        assert NumberSpec(spec).to_spec() == spec

    def test_known_stream(self):
        """A known byte stream decodes to known intervals — tests the
        test infrastructure (NumberPreparerTest.testKnownStream)."""
        br = BitReader(bytes([0x41, 0x13, 0x27, 0x49, 0x60]))
        nr = NumberReader(br)
        nr.set_number_of_nodes(1)
        numbers = nr.read_numbers(True)
        assert len(numbers) == 1
        assert numbers[0].to_spec() == "0,E,24,8,O,23,13"

    def test_increasing_numbers(self):
        run("0,O,1,11,E,2,12")

    def test_swapped_default_styles(self):
        numbers = create_list(["0,E,2,12,O,1,11"])
        output = write_and_read(numbers)
        assert [n.to_spec() for n in output] == [n.to_spec() for n in numbers]

    def test_increasing_high_starts(self):
        for t in ["0,O,1,5,E,2,6", "0,O,3,7,E,4,8",
                  "0,O,91,99,E,92,98", "0,O,1,15,E,4,8"]:
            numbers = create_list([t])
            output = write_and_read(numbers)
            assert [n.to_spec() for n in output] == [n.to_spec() for n in numbers]

    def test_single_numbers(self):
        run_separate("0,O,7,7,E,8,8", "0,O,7,7,E,6,6")

    def test_large_different_starts(self):
        run_separate("0,O,91,103,E,2,8", "0,E,90,102,O,3,9")

    def test_multiple_nodes(self):
        numbers = create_list([
            "0,O,1,9,E,2,12",
            "1,O,11,17,E,14,20",
            "2,O,21,31,E,26,36",
        ])
        output = write_and_read(numbers)
        assert [n.to_spec() for n in output] == [n.to_spec() for n in numbers]

    def test_multiple_with_reverse(self):
        run("0,E,2,2,O,1,5", "1,E,2,10,O,5,17")

    def test_decreasing(self):
        run("0,O,25,11,E,24,20")

    def test_mixed_styles(self):
        run("0,O,1,9,E,6,12", "1,E,14,22,O,9,17", "2,O,17,21,E,26,36")

    def test_one_side(self):
        run_separate("0,N,-1,-1,O,9,3")
        run_separate("0,E,2,8,N,-1,-1", "0,N,-1,-1,O,9,3")

    def test_both(self):
        run_separate("0,B,1,10,B,11,20")

    def test_large_runs_and_gaps(self):
        run("0,E,100,200,O,111,211", "1,E,400,500,O,421,501",
            "2,E,600,650,O,601,691")

    def test_skip(self):
        run("0,E,2,20,O,1,9", "3,O,3,9,E,2,2")

    def test_skip_first(self):
        run("2,O,1,5,E,2,2")

    def test_large_skip(self):
        run("0,N,-1,-1,E,2,4", "100,O,1,9,E,8,16")

    def test_repeating_run(self):
        counter = []
        run("0,O,1,9,E,2,10",
            "1,O,11,19,E,12,20",
            "2,O,21,29,E,22,30",
            "3,O,31,39,E,32,40",
            byte_counter=counter)
        assert sum(counter) <= 8

    def test_zero(self):
        run_separate("0,E,0,10,N,-1,-1", "1,B,0,4,B,0,8")

    def test_very_large_number(self):
        preparer = NumberPreparer(create_list(["0,E,55892490,55892500,N,-1,-1"]))
        assert not preparer.is_valid()

        preparer = NumberPreparer(create_list(["0,E,10,55892500,N,-1,-1"]))
        assert not preparer.is_valid()

    def test_large_but_ok(self):
        run("0,O,1,10001,E,2,12000",
            "1,O,10003,10301,E,12002,12060",
            "2,E,1047000,1048000,N,-1,-1")
        run_separate("3,E,131000,2,N,-1,-1")

    def test_large_difference_error(self):
        preparer = NumberPreparer(create_list(["3,E,131080,2,N,-1,-1"]))
        assert not preparer.is_valid()

    def test_regression(self):
        """Sequences the reference's random generator once found to fail."""
        tests = [
            ["0,E,4,2,E,2,2", "1,E,10,8,O,3,1", "2,B,8,6,B,3,3", "3,E,8,2,E,2,2"],
            ["0,O,5,7,O,9,5", "1,N,-1,-1,O,3,7", "2,N,-1,-1,O,3,5"],
            ["0,N,-1,-1,O,3,5", "1,O,1,3,N,-1,-1", "2,E,4,4,E,6,8"],
            ["0,N,-1,-1,E,4,4", "1,E,4,4,O,3,11"],
            ["0,B,4,8,O,5,9", "1,O,5,3,O,7,7", "2,O,3,3,E,4,20"],
            ["0,E,8,6,B,6,2", "1,O,5,5,E,4,8"],
            ["0,B,16,1,B,10,5", "1,O,3,7,E,2,8"],
            ["0,B,10,5,E,22,10", "1,O,3,1,O,3,5"],
            ["0,B,10,10,N,-1,-1", "1,O,11,9,O,1,11", "2,O,3,3,E,8,4",
             "3,O,7,19,E,6,2", "4,E,10,6,E,4,4"],
            ["0,N,-1,-1,B,6,5", "1,O,3,11,O,3,3"],
            ["0,O,7,1,O,9,5", "1,O,27,23,O,3,5"],
            ["0,B,5,5,E,12,8"],
        ]
        for sarr in tests:
            run(*sarr)


# ------------------------------------------------------------------
# NumberRangeTest.java — seeded random round trips
# ------------------------------------------------------------------

def _random_range(rand):
    style = "NEEEOOOBB"[rand.randrange(9)]
    max_ = 10
    r = rand.randrange(20)
    if r > 17:
        max_ = 30
    start = rand.randrange(max_) + 1
    end = rand.randrange(max_) + 1
    if style == "O":
        start |= 1
        end |= 1
    elif style == "E":
        start = (start + 1) & ~1
        end = (end + 1) & ~1
    elif style == "N":
        start = end = -1
    return "%s,%d,%d" % (style, start, end)


def test_random_ranges_round_trip():
    rand = random.Random(8866028)
    for _ in range(4000):
        sl = []
        for i in range(20):
            while True:
                n = "%d,%s,%s" % (i, _random_range(rand), _random_range(rand))
                if not (i == 0 and "N,-1,-1,N" in n):
                    break
            sl.append(n)
            if rand.randrange(3) > 1:
                break
        run(*sl)


# ------------------------------------------------------------------
# The gate query's synthesis space (queries.q_number_streams): every
# road pattern — plain, side-swapped, descending-left — must round-trip
# to identity, since the DuckDB oracle simply regenerates the input.
# ------------------------------------------------------------------

def _gate_rows(k):
    rows = []
    for j in range(k % 4 + 1):
        ls = (k * 7 + j * 13) % 50 * 2 + 1
        le = ls + ((k + 3 * j) % 10 + 1) * 2
        rs = (k * 11 + j * 17) % 50 * 2 + 2
        re_ = rs + ((k + 5 * j) % 10 + 1) * 2
        if k % 3 == 1:
            rows.append((j, "E", rs, re_, "O", ls, le))
        elif k % 6 == 3:
            rows.append((j, "O", le, ls, "E", rs, re_))
        else:
            rows.append((j, "O", ls, le, "E", rs, re_))
    return rows


def test_gate_synthesis_round_trips():
    for k in range(1, 2001):
        rows = _gate_rows(k)
        specs = []
        for (j, lsty, ls, le, rsty, rs, re_) in rows:
            n = NumberSpec()
            n.node = j
            n.index = j
            n.set_numbers(True, lsty, ls, le)
            n.set_numbers(False, rsty, rs, re_)
            specs.append(n)
        prep = NumberPreparer(specs)
        bw = prep.fetch_bit_stream()
        assert prep.is_valid(), k
        nr = NumberReader(BitReader(bw.get_bytes()[: bw.length]))
        nr.set_number_of_nodes(specs[-1].get_index() + 1)
        out = nr.read_numbers(prep.get_swapped())
        got = [
            (d.get_index(), d.left_style, d.left_start, d.left_end,
             d.right_style, d.right_start, d.right_end)
            for d in out
        ]
        assert got == rows, k


# ------------------------------------------------------------------
# RoadDefTest.java (testBitArray): the writeNod2 byte-packing loop
# must agree with BitWriter.put1 for any bit array.
# ------------------------------------------------------------------

def test_bit_array_matches_put1_loop():
    rand = random.Random(0xD06)
    for trial in range(50):
        n = 26 if trial == 0 else rand.randrange(1, 64)
        bits = [rand.random() < 0.5 for _ in range(n)]

        # the loop taken from RoadDef.writeNod2
        loop = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                if i + j < len(bits) and bits[i + j]:
                    b |= 1 << j
            loop.append(b)

        bw = BitWriter()
        for bit in bits:
            bw.put1(bit)
        assert bw.get_bytes()[: bw.length] == bytes(loop)
