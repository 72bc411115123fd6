"""Wave-100 operator pins: hull/calipers, closest pair, point-in-poly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

POINT = st.tuples(st.integers(-50, 50), st.integers(-50, 50))


def test_hull_known():
    from basicocr_ray.pipelines.queries import convex_hull

    sq = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (2, 0)]
    h = set(convex_hull(sq))
    assert h == {(0, 0), (4, 0), (4, 4), (0, 4)}
    assert convex_hull([(1, 1)]) == [(1, 1)]
    # all collinear: endpoints only
    assert set(convex_hull([(0, 0), (1, 1), (2, 2), (3, 3)])) == {
        (0, 0), (3, 3)
    }


@settings(max_examples=60, deadline=None)
@given(st.lists(POINT, min_size=1, max_size=40))
def test_diameter_fuzz(pts):
    from basicocr_ray.pipelines.queries import hull_diameter_sq

    brute = max(
        (
            (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            for a in pts
            for b in pts
        ),
        default=0,
    )
    assert hull_diameter_sq(pts) == brute


@settings(max_examples=60, deadline=None)
@given(st.lists(POINT, min_size=2, max_size=40))
def test_closest_pair_fuzz(pts):
    from basicocr_ray.pipelines.queries import closest_pair_sq

    up = sorted(set(pts))
    if len(up) < 2:
        assert closest_pair_sq(pts) == -1
        return
    brute = min(
        (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
        for i, a in enumerate(up)
        for b in up[i + 1 :]
    )
    assert closest_pair_sq(pts) == brute


def test_point_in_polygon_parity():
    """Hand-checked probes against the fixed hexagon."""
    import numpy as np

    from basicocr_ray.pipelines.queries import _POLY

    def inside(x, y):
        flag = False
        for k in range(len(_POLY)):
            x1, y1 = _POLY[k]
            x2, y2 = _POLY[(k + 1) % len(_POLY)]
            if (y1 < y) != (y2 < y):
                lhs = (x - x1) * (y2 - y1)
                rhs = (x2 - x1) * (y - y1)
                if (lhs < rhs) if y2 > y1 else (lhs > rhs):
                    flag = not flag
        return flag

    assert inside(450, 450)       # center
    assert not inside(950, 450)   # right of everything
    assert not inside(10, 890)    # above the left shoulder
    assert inside(400, 880)       # just under the apex
    assert not inside(-5, 300)    # left of the left edge
