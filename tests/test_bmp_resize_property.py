"""Property-based check of the BMP pixel decode + 2×2 box-filter
resize against a pure-Python reference: random even-dimension images
(widths 2-8 exercise every stride-padding residue: pad 2, 0, 2, 0)
with random pixel bytes must produce exactly the per-channel resized
sums and the orientation probe a double-loop floor-average computes.

The fixed-shape test (test_operator_edges) pins the flip semantics
on one 2×4 image; hypothesis varies dims and content so a stride or
block-grouping bug tied to a particular width can't hide. The blobs
come from ``_hand_bmp`` — a second, independent BMP writer — so this
also cross-checks the operator free of the planting expressions its
DuckDB oracle restates.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_operator_edges import _hand_bmp

_DIM = st.sampled_from((2, 4, 6, 8))

_IMAGE = st.tuples(_DIM, _DIM, st.randoms(use_true_random=False)).map(
    lambda t: (
        t[0],
        t[1],
        [
            [tuple(t[2].randrange(256) for _ in range(3)) for _ in range(t[0])]
            for _ in range(t[1])
        ],
    )
)


def _reference(width, height, px):
    rw, rh = width // 2, height // 2
    sums = [0, 0, 0]
    b00 = None
    for by in range(rh):
        for bx in range(rw):
            for c in range(3):
                v = (
                    px[2 * by][2 * bx][c]
                    + px[2 * by][2 * bx + 1][c]
                    + px[2 * by + 1][2 * bx][c]
                    + px[2 * by + 1][2 * bx + 1][c]
                ) // 4
                sums[c] += v
                if by == 0 and bx == 0 and c == 0:
                    b00 = v
    return tuple(sums), b00


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_IMAGE)
def test_bmp_resize_matches_pure_python_reference(spark, image):
    from oracle_to_cassandra_spark.operators import multimodal as M

    width, height, px = image
    blob = _hand_bmp(width, height, px)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, payload binary"
    )
    row = M.decode_bmp_resize_box(df).collect()[0]
    sums, b00 = _reference(width, height, px)
    assert (row.resized_w, row.resized_h) == (width // 2, height // 2)
    assert (row.rs_sum_b, row.rs_sum_g, row.rs_sum_r) == sums
    assert row.rs_b00 == b00
