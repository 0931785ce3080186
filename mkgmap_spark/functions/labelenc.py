"""Garmin label character encodings — the LBL-side char transforms.

Re-expresses the reference's label-encoder family
(`imgfmt/app/labelenc/Format6Encoder.java`, `Format6Decoder.java`,
`AnyCharsetEncoder.java:43-96`, `Utf8Encoder.java`,
`CodeFunctions.java:60-120`) as pure Python kernels plus an
Arrow-batched Spark column wrapper.  The 6-bit format uppercases,
strips diacritics through the transliteration tables, then packs each
character into 6 bits MSB-first with shift prefixes for symbols
(0x1C) and lower-case/separators (0x1B); single-byte codepages encode
through the named codec with per-char transliteration fallback and a
trailing NUL; cp65001 is plain UTF-8 plus NUL.

Only the CHARACTER-LEVEL transform is in scope — the surrounding .img
LBL section writers are binary-format machinery excluded by the
BASELINE input hint.  At 100-TB scale the encoder is a stateless
per-row kernel (no shuffle, no broadcast); the Spark surface below is
a pandas_udf over the label column.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from .translit import transliterate

# Format6Encoder.java:40-50 (SYMBOL_SHIFT is 0x1c in the shipped code)
SYMBOL_SHIFT = 0x1C
LOWER_SHIFT = 0x1B

LETTERS = (
    " ABCDEFGHIJKLMNO"  # 0x00-0x0F
    "PQRSTUVWXYZxx   "  # 0x10-0x1F
    "0123456789"  # 0x20-0x2F
)

SYMBOLS = (
    "@!\"#$%&'()*+,-./"  # 0x00-0x0F
    "xxxxxxxxxx:;<=>?"  # 0x10-0x1F
    "xxxxxxxxxxx[\\]^_"  # 0x20-0x2F
)


@dataclass(frozen=True)
class EncodedText:
    """EncodedText.java: ctext buffer + valid length + source chars.

    The empty/null encodings compare equal and hash to zero, matching
    the reference's hashCode/equals contract (LabelEncTest)."""

    ctext: bytes | None
    length: int
    chars: str | None

    def _key(self) -> tuple:
        body = (self.ctext or b"")[: self.length]
        return (body, self.chars or "")

    def __eq__(self, other) -> bool:  # type: ignore[override]
        return isinstance(other, EncodedText) and self._key() == other._key()

    def __hash__(self) -> int:
        if not (self.ctext or "") and not (self.chars or ""):
            return 0
        return hash(self._key())


NO_TEXT = EncodedText(None, 0, None)


def _pack6(sixes: list[int]) -> bytes:
    """put6: MSB-first 6-bit packing into a byte stream."""
    buf = bytearray((len(sixes) * 6 + 7) // 8 + 1)
    for off, c in enumerate(sixes):
        bit = off * 6
        byte_off, shift = divmod(bit, 8)
        buf[byte_off] |= ((c & 0x3F) << 2) >> shift
        if shift > 2:
            buf[byte_off + 1] |= (((c & 0x3F) << 2) << (8 - shift)) & 0xFF
    return bytes(buf)


def encode_format6(text: str | None) -> EncodedText:
    """Format6Encoder.encodeText: transliterate to ascii, uppercase,
    6-bit pack with symbol shifts, 0xFF terminator."""
    if not text:
        return NO_TEXT
    s = (transliterate(text, "ascii") or "").upper()
    sixes: list[int] = []
    for ch in s:
        o = ord(ch)
        if ch == " ":
            sixes.append(0)
        elif "A" <= ch <= "Z":
            sixes.append(o - ord("A") + 1)
        elif "0" <= ch <= "9":
            sixes.append(o - ord("0") + 0x20)
        elif o in (0x1B, 0x1C):
            sixes.extend((0x1B, o + 0x10))
        elif 0x1D <= o <= 0x1F:
            sixes.append(o)
        elif 1 <= o <= 6:
            # highway shields
            sixes.append(0x29 + o)
        else:
            ind = SYMBOLS.find(ch)
            if ind >= 0:
                sixes.extend((SYMBOL_SHIFT, ind))
    n = len(sixes)
    sixes.append(0xFF)
    length = (n * 6) // 8 + 1
    return EncodedText(_pack6(sixes), length, s)


def decode_format6(data: bytes) -> tuple[str, int]:
    """Format6Decoder: 6-bit unpack with the symbol / lower-case
    shift states; stops at the first six > 0x2F.  Returns (text,
    offset_adjustment) — the adjustment is -1 when a byte remains in
    the bit store (DecodedText.setOffsetAdjustment)."""
    out: list[str] = []
    symbol = lower = False
    store = nbits = 0
    done = False
    for b in data:
        if done:
            break
        store = ((store << 8) | (b & 0xFF)) & 0xFFFFFFFF
        nbits += 8
        while nbits >= 6:
            six = (store >> (nbits - 6)) & 0x3F
            if six > 0x2F:
                nbits = 8 if nbits > 8 else 0
                done = True
                break
            if symbol:
                symbol = False
                out.append(SYMBOLS[six])
            elif lower:
                lower = False
                if six in (0x2B, 0x2C):
                    out.append(chr(six - 0x10))  # thin separator
                elif LETTERS[six].isalpha():
                    out.append(LETTERS[six].lower())
                else:
                    out.append(LETTERS[six])
            elif six == LOWER_SHIFT:
                lower = True
            elif six == SYMBOL_SHIFT:
                symbol = True
            elif 0x1D <= six <= 0x1F:
                out.append(chr(six))
            else:
                out.append(LETTERS[six])
            if done:
                break
            nbits -= 6
    return "".join(out), (-1 if nbits == 8 else 0)


def encode_any_charset(
    text: str | None, codec: str, translit_charset: str, *, upper: bool = False
) -> EncodedText:
    """AnyCharsetEncoder.encodeText: per-char codec encode with
    transliteration fallback for unmappables, trailing NUL byte."""
    if not text:
        return NO_TEXT
    if upper:
        text = text.upper()
    out = bytearray()
    chars: list[str] = []
    for ch in text:
        try:
            b = ch.encode(codec)
            out += b
        except (UnicodeEncodeError, LookupError):
            t = transliterate(ch, translit_charset) or ""
            out += bytes(ord(c) & 0xFF for c in t)
    chars = [chr(b) for b in out]
    out.append(0)
    return EncodedText(bytes(out), len(out), "".join(chars))


def decode_any_charset(data: bytes, codec: str) -> str:
    body = data.split(b"\x00", 1)[0]
    return body.decode(codec, errors="replace")


def encode_utf8(text: str | None) -> EncodedText:
    """Utf8Encoder: UTF-8 bytes + NUL (no transliteration)."""
    if not text:
        return NO_TEXT
    buf = text.encode("utf-8") + b"\x00"
    return EncodedText(buf, len(buf), text)


@dataclass(frozen=True)
class CodeFunctions:
    """CodeFunctions.java: (codepage, encoding type, encoder, decoder)
    resolved from a charset name or an (lbl format, codepage) pair."""

    codepage: int
    encoding_type: int
    codec: str | None  # None => format6 path; 'utf-8' => format10

    def encode(self, text: str | None) -> EncodedText:
        if self.encoding_type == 6:
            return encode_format6(text)
        if self.codec == "utf-8":
            return encode_utf8(text)
        translit = "latin1" if self.codepage == 1252 else "ascii"
        return encode_any_charset(text, self.codec or "ascii", translit)

    def decode(self, data: bytes) -> str:
        if self.encoding_type == 6:
            return decode_format6(data)[0]
        if self.codec == "utf-8":
            return decode_any_charset(data, "utf-8")
        return decode_any_charset(data, self.codec or "ascii")


def create_encoder_for_lbl(charset: str | int, codepage: int = 0) -> CodeFunctions:
    """CodeFunctions.createEncoderForLBL (both overloads)."""
    if isinstance(charset, int):
        if charset == 6:
            return create_encoder_for_lbl("ascii")
        return create_encoder_for_lbl(f"cp{codepage}")
    cs = charset.lower()
    if cs == "ascii":
        return CodeFunctions(0, 6, None)
    if cs == "cp0":
        return CodeFunctions(0, 9, "ascii")
    if cs in ("cp1252", "latin1"):
        return CodeFunctions(1252, 9, "cp1252")
    if cs in ("cp65001", "unicode"):
        return CodeFunctions(65001, 10, "utf-8")
    if cs in ("cp932", "ms932"):
        return CodeFunctions(932, 10, "cp932")
    if cs.startswith("cp"):
        try:
            page = int(cs[2:])
        except ValueError:
            raise ValueError(f"Invalid character set: {cs}")
        return CodeFunctions(page, 9, cs)
    if cs.startswith("windows-"):
        try:
            page = int(cs[8:])
        except ValueError:
            raise ValueError(f"Invalid character set: {cs}")
        return CodeFunctions(page, 9, f"cp{page}")
    return CodeFunctions(0, 9, cs)


def label_encode6_col(col):
    """Spark surface: 6-bit-encode a label column to binary.

    Arrow-batched; the kernel is stateless so the projection neither
    shuffles nor broadcasts — safe in any 100-TB scan."""
    from pyspark.sql import functions as F

    def _one(v):
        if v is None:
            return None
        e = encode_format6(v)
        return (e.ctext or b"")[: e.length]

    @F.pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(_one)

    return _enc(col)


def label_roundtrip6_col(col):
    """Spark surface for the format-6 round trip: encode the label,
    decode the truncated byte stream back, and report the encoded
    length — one stateless Arrow-batched projection (no shuffle).

    Exercises Format6Encoder + Format6Decoder end-to-end
    (imgfmt/app/labelenc/Format6Encoder.java / Format6Decoder.java):
    for ascii inputs the decode equals upper(text) and the length is
    the closed-form (sixes*6)//8 + 1, which is what the SQL oracle of
    the `label_roundtrip` gate query checks."""
    from pyspark.sql import functions as F

    def _one(v):
        if v is None:
            return None
        e = encode_format6(v)
        dec, _ = decode_format6((e.ctext or b"")[: e.length])
        return {"decoded": dec, "enc_len": e.length}

    @F.pandas_udf("struct<decoded: string, enc_len: int>")
    def _rt(s: pd.Series) -> pd.DataFrame:
        out = s.map(_one)
        return pd.DataFrame(
            [(None, None) if v is None else (v["decoded"], v["enc_len"]) for v in out],
            columns=["decoded", "enc_len"],
        )

    return _rt(col)
