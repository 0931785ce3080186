"""Exact polygon split along a lat/lon line — crossing-point pairing
with area bookkeeping.

Port of the reference algorithm (util/ShapeSplitter.java:554-651
``splitShape``, :286-397 ``processLineList``/``doLines``, :424-540
``MergeCloseHelper``): walk the closed ring accumulating a running
shoelace area; each excursion to one side of the dividing line becomes
a "line" that starts and ends ON the line with its partial area; lines
are sorted by their low crossing point and nested shapes/holes are
paired by the doLines recursion (a hole's points are spliced into its
enclosing shape, shapes inside holes recurse).  This handles shapes
that touch or run along the dividing line exactly — the cases where a
Sutherland-Hodgman clip diverges (degenerate seams, spikes, nested
excursions).

Pure integer arithmetic end to end (int64 shoelace terms); the single
rounding is the crossing-point interpolation (Math.round ==
floor(x + 0.5), matching the reference bit for bit).  Unit-agnostic:
works on map units or high-precision units alike.

Used by clip_assign for exact tile splitting (clip_shape_exact) and
verified against the reference's own golden cases
(test/uk/me/parabola/util/ShapeSplitterTest.java) in
tests/test_shape_split.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class _Line:
    """MergeCloseHelper (ShapeSplitter.java:424)."""

    points: list = field(default_factory=list)  # (lat, lon) tuples
    first_point: int = 0
    last_point: int = 0
    starting_area: int = 0
    ending_area: int = 0
    direction: int = 0
    low_point: int = 0
    high_point: int = 0
    area_to_line: int = 0
    area_or_hole: int = 0

    def set_more_info(self, full_area_sign: int):
        self.direction = _sign(self.last_point - self.first_point)
        if self.direction > 0:
            self.low_point, self.high_point = self.first_point, self.last_point
        else:
            self.low_point, self.high_point = self.last_point, self.first_point
        self.area_to_line = self.ending_area - self.starting_area
        self.area_or_hole = full_area_sign * _sign(self.area_to_line)

    def combine_first_into_last(self, other: "_Line", full_area: int):
        self.points.extend(other.points)
        self.last_point = other.last_point
        self.ending_area = full_area + other.ending_area

    def sort_key(self):
        # compareTo: low asc, high desc, shape-before-hole, direction
        return (self.low_point, -self.high_point, -self.area_or_hole, self.direction)

    def add_hole(self, other: "_Line"):
        if other.area_to_line == 0:
            return  # spike
        if self.direction < 0 or other.direction > 0:
            self.points.extend(other.points)
            if self.direction == 0:
                self.direction = -1
        else:
            other.points.extend(self.points)
            self.points = other.points
            if self.direction == 0:
                self.direction = 1
        self.area_to_line += other.area_to_line

    def close_append(self, orig_list: list, on_dividing_line: bool):
        if not self.points:
            return
        if self.points[0] == self.points[-1]:
            pass  # already closed
        else:
            self.points.append(self.points[0])
        if on_dividing_line and self.area_to_line == 0:
            return  # spike across the line
        orig_list.append(self.points)


def _sign(x) -> int:
    return (x > 0) - (x < 0)


def _java_round(x: float) -> int:
    return int(math.floor(x + 0.5))


def _do_lines(start_inx: int, end_enclosed: int, add_holes_to, line_info, orig_list) -> int:
    """doLines (ShapeSplitter.java:298-316): pair nested shapes/holes."""
    inx = start_inx
    called_from_hole = add_holes_to is None
    while inx < len(line_info):
        this_line = line_info[inx]
        if this_line.high_point > end_enclosed:
            break
        if this_line.low_point == end_enclosed and this_line.high_point == end_enclosed:
            if called_from_hole == (this_line.area_or_hole == -1):
                break
        inx = _do_lines(inx + 1, this_line.high_point, this_line if called_from_hole else None, line_info, orig_list)
        if called_from_hole:
            this_line.close_append(orig_list, True)
        else:
            add_holes_to.add_hole(this_line)
    return inx


def _process_line_list(line_info, orig_list, full_area: int):
    """processLineList (ShapeSplitter.java:324-397)."""
    if orig_list is None:
        return
    first_line = line_info[0]
    if len(line_info) == 1:
        if first_line.points:
            first_line.close_append(orig_list, False)
        return
    last_line = line_info[-1]
    if not last_line.points:
        line_info.pop()
    else:
        last_line.combine_first_into_last(first_line, full_area)
        line_info.pop(0)
        first_line = line_info[0]
    if len(line_info) == 1:
        first_line.set_more_info(0)
        first_line.close_append(orig_list, True)
        return

    full_area_sign = _sign(full_area)
    some_unset = False
    area_direction = 0
    for tl in line_info:
        tl.set_more_info(full_area_sign)
        if tl.direction == 0:
            some_unset = True
        elif tl.area_to_line != 0:
            tmp = tl.direction * _sign(tl.area_to_line)
            if area_direction == 0:
                area_direction = tmp
    if some_unset and area_direction != 0:
        for tl in line_info:
            if tl.direction == 0:
                tl.direction = area_direction * _sign(tl.area_to_line)
    line_info.sort(key=_Line.sort_key)
    _do_lines(0, (1 << 62), None, line_info, orig_list)


def split_shape(
    lats,
    lons,
    dividing_line: int,
    is_longitude: bool,
    want_less: bool = True,
    want_more: bool = True,
) -> tuple[list | None, list | None]:
    """Split a CLOSED ring (first point == last point) along a line of
    latitude/longitude.  Returns (less_list, more_list): lists of
    closed rings [(lat, lon), ...] on each side (None for an unwanted
    side).  ShapeSplitter.splitShape:554-651, exact port."""
    n = len(lats)
    assert n >= 2 and lats[0] == lats[-1] and lons[0] == lons[-1], "ring must be closed"

    new_less = [] if want_less else None
    new_more = [] if want_more else None
    less_poly = more_poly = None
    if want_less:
        new_less.append(_Line())
        less_poly = new_less[-1].points
    if want_more:
        new_more.append(_Line())
        more_poly = new_more[-1].points

    trail = None
    trail_away = trail_along = trail_rel = 0
    running_area = 0

    for i in range(n):
        lead = (int(lats[i]), int(lons[i]))
        lead_away = lead[1] if is_longitude else lead[0]
        lead_along = lead[0] if is_longitude else lead[1]
        lead_rel = _sign(lead_away - dividing_line)
        if trail is not None:
            line_coord = None
            line_along = trail_along
            if trail_rel == 0:
                line_coord = trail
            elif lead_rel == 0:
                line_coord = lead
                line_along = lead_along
            elif trail_rel != lead_rel:
                if line_along != lead_along:
                    line_along += _java_round(
                        (dividing_line - trail_away)
                        * (lead_along - trail_along)
                        / (lead_away - trail_away)
                    )
                line_coord = (
                    (line_along, dividing_line) if is_longitude else (dividing_line, line_along)
                )

            if lead_rel * trail_rel >= 0:
                extra_area = (trail_along + lead_along) * (trail_away - lead_away)
            else:
                running_area += (trail_along + line_along) * (trail_away - dividing_line)
                extra_area = (line_along + lead_along) * (dividing_line - lead_away)

            if want_less:
                if lead_rel < 0:
                    if trail_rel >= 0:
                        t = new_less[-1]
                        t.points.append(line_coord)
                        t.first_point = line_along
                        t.starting_area = running_area
                    less_poly.append(lead)
                elif trail_rel < 0:
                    t = new_less[-1]
                    t.points.append(line_coord)
                    t.last_point = line_along
                    t.ending_area = running_area + (extra_area if lead_rel == 0 else 0)
                    new_less.append(_Line())
                    less_poly = new_less[-1].points

            if want_more:
                if lead_rel > 0:
                    if trail_rel <= 0:
                        t = new_more[-1]
                        t.points.append(line_coord)
                        t.first_point = line_along
                        t.starting_area = running_area
                    more_poly.append(lead)
                elif trail_rel > 0:
                    t = new_more[-1]
                    t.points.append(line_coord)
                    t.last_point = line_along
                    t.ending_area = running_area + (extra_area if lead_rel == 0 else 0)
                    new_more.append(_Line())
                    more_poly = new_more[-1].points

            running_area += extra_area
        trail = lead
        trail_away, trail_along, trail_rel = lead_away, lead_along, lead_rel

    less_list = [] if want_less else None
    more_list = [] if want_more else None
    _process_line_list(new_less, less_list, running_area)
    _process_line_list(new_more, more_list, running_area)
    return less_list, more_list


def clip_shape_exact(lats, lons, bounds: tuple[int, int, int, int]) -> list:
    """Clip a closed ring to (min_lat, min_lon, max_lat, max_lon) by
    four successive exact splits (ShapeSplitter.clipToBounds:662 uses
    splitShape per side keeping one half)."""
    shapes = [list(zip([int(x) for x in lats], [int(x) for x in lons]))]
    if shapes[0][0] != shapes[0][-1]:
        shapes[0].append(shapes[0][0])
    min_lat, min_lon, max_lat, max_lon = bounds
    for line, is_lon, keep_more in (
        (min_lat, False, True),
        (max_lat, False, False),
        (min_lon, True, True),
        (max_lon, True, False),
    ):
        nxt = []
        for ring in shapes:
            la = [p[0] for p in ring]
            lo = [p[1] for p in ring]
            less, more = split_shape(
                la, lo, line, is_lon, want_less=not keep_more, want_more=keep_more
            )
            nxt.extend(more if keep_more else less)
        shapes = nxt
        if not shapes:
            break
    return shapes
