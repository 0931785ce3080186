"""Golden rule corpus: the reference's scripted style tests
(test/resources/rules/*.test, runner test/func/style/ScriptedStyleTest
.java:40-70) executed against BOTH the Python interpreter and the
compiled Column program.

File format: WAY blocks with tag lines, a ``<<<lines>>>`` ruleset
(may contain a ``<finalize>`` section), and ``<<<results>>>`` lines

    WAY 1: Line 0x7, labels=[a, b, null, null], res=24-24 (1/1),(2/2),
    WAY 1: Road 0x1, ... res=24-24 oneway (2/2),(1/1), road class=1 speed=0

We check, per way: the ordered (type_code, min_res, max_res,
road_class, road_speed) emissions, and the labels of the terminating
emission (mkgmap:label:1..4 from the final persistent tag state — the
intermediate continue emissions carry per-snapshot labels the engine
does not materialize).  Point-order/oneway rendering flags are
converter output, out of the rule engine's scope.
"""

from __future__ import annotations

import os
import re

import pytest

from mkgmap_spark.rules import compile_rules, interpret, parse_rules

RULES_DIR = "/root/reference/test/resources/rules"

_WAY_RE = re.compile(r"^(way|WAY|Way)(\s+(\d+))?\s*$")
_RESULT_RE = re.compile(
    r"^WAY (\d+): (?:Line|Road|Point) (0x[0-9a-fA-F]+), labels=\[(.*?)\], "
    r"res=(\d+)-(\d+)(.*)$"
)
_ROAD_RE = re.compile(r"road class=(\d+) speed=(\d+)")


def parse_test_file(path: str):
    ways: list[tuple[int, dict]] = []
    rules_src: list[str] = []
    expected: dict[int, list[dict]] = {}
    section = "ways"
    cur_tags: dict | None = None
    cur_id = 0
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("<<<lines>>>"):
                section = "lines"
                continue
            if line.startswith("<<<results>>>"):
                section = "results"
                continue
            if section == "ways":
                s = line.strip()
                if not s or s.startswith("#"):
                    continue
                m = _WAY_RE.match(s)
                if m:
                    cur_id = int(m.group(3)) if m.group(3) else (ways[-1][0] + 1 if ways else 1)
                    cur_tags = {}
                    ways.append((cur_id, cur_tags))
                elif "=" in s and cur_tags is not None:
                    k, v = s.split("=", 1)
                    cur_tags[k.strip()] = v.strip()
            elif section == "lines":
                rules_src.append(line)
            else:
                s = line.strip()
                if not s or s.startswith("#") or s == "NO-STRICT":
                    continue
                m = _RESULT_RE.match(s)
                assert m, f"unparsed expected line in {path}: {s!r}"
                wid = int(m.group(1))
                labels = [x.strip() for x in m.group(3).split(",")]
                labels = [None if x == "null" else x for x in labels]
                tail = m.group(6)
                rm = _ROAD_RE.search(tail)
                expected.setdefault(wid, []).append(
                    {
                        "type_code": int(m.group(2), 16),
                        "min_res": int(m.group(4)),
                        "max_res": int(m.group(5)),
                        "labels": labels,
                        "road_class": int(rm.group(1)) if rm else None,
                        "road_speed": int(rm.group(2)) if rm else None,
                    }
                )
    return ways, "\n".join(rules_src), expected


GOLDEN_FILES = sorted(
    f for f in os.listdir(RULES_DIR) if f.endswith(".test")
)


@pytest.mark.parametrize("fname", GOLDEN_FILES)
def test_golden_interpreter(fname):
    ways, src, expected = parse_test_file(os.path.join(RULES_DIR, fname))
    rules = parse_rules(src)
    for wid, tags in ways:
        types, out_tags = interpret(rules, tags, el={"id": wid, "kind": "way"})
        want = expected.get(wid, [])
        got = [(g.type_code, g.min_res, g.max_res) for g in types]
        assert got == [(e["type_code"], e["min_res"], e["max_res"]) for e in want], (
            fname,
            wid,
            tags,
        )
        for g, e in zip(types, want):
            if e["road_class"] is not None:
                assert g.road_class == e["road_class"], (fname, wid)
                assert g.road_speed == e["road_speed"], (fname, wid)
        if want:
            want_labels = want[-1]["labels"]
            got_labels = [out_tags.get(f"mkgmap:label:{i}") for i in range(1, 5)]
            assert got_labels == want_labels, (fname, wid, out_tags)


def test_golden_compiled(spark):
    """All golden files through the compiled engine in one pass per
    file; compiled output must equal the interpreter's (which the test
    above pins to the reference's expected results)."""
    for fname in GOLDEN_FILES:
        ways, src, expected = parse_test_file(os.path.join(RULES_DIR, fname))
        rules = parse_rules(src)
        rows = [(wid, tags, [0, 1000], [0, 1000]) for wid, tags in ways]
        df = spark.createDataFrame(
            rows, "id long, tags map<string,string>, lats array<int>, lons array<int>"
        )
        out = {
            r["id"]: (
                [(x["type_code"], x["min_res"], x["max_res"], x["road_class"], x["road_speed"]) for x in r["results"]],
                dict(r["tags_out"]),
            )
            for r in compile_rules(rules, df, id_col="id").collect()
        }
        for wid, tags in ways:
            types, want_tags = interpret(rules, tags, el={"id": wid, "kind": "way"})
            want = (
                [(g.type_code, g.min_res, g.max_res, g.road_class, g.road_speed) for g in types],
                want_tags,
            )
            assert out[wid] == want, (fname, wid, tags, out[wid], want)
