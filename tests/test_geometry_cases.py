"""Facet-geometry behavior sweep at the reference suite's depth.

Port of /root/reference/africanus/linalg/test/test_geometry.py (285
lines, ten numbered cases in one function) as separate cases: hull mask
area/normals, sinc-image regional extraction, overlap/containment,
box factories (odd/square/split/pad) and facet stitching with overlap
normalisation. The numeric inputs are the reference's spec — identical
coordinates pin identical behavior."""

import numpy as np
import pytest

from africanus_tpu.linalg.geometry import (
    BoundingBox,
    BoundingBoxFactory,
    BoundingConvexHull,
)


@pytest.fixture(scope="module")
def sinc2d():
    npx = 255
    s = np.sinc(np.linspace(-7, 7, npx))
    return np.outer(s, s).reshape((1, 1, npx, npx))


@pytest.fixture(scope="module")
def hull_main():
    return BoundingConvexHull(
        np.array([[50, 60], [20, 40], [-74, 50], [-95, +10], [20, 60]])
    )


def test_hull_mask_area_and_normals(hull_main):
    """Case 1-2: the filled mask spans the vertex extent, its integral
    matches the analytic hull area to 5%, and every edge is orthogonal
    to its right normal."""
    vals = hull_main.corners
    mask = hull_main.mask
    assert mask.shape == (
        np.max(vals[:, 1]) - np.min(vals[:, 1]) + 1,
        np.max(vals[:, 0]) - np.min(vals[:, 0]) + 1,
    )
    assert np.abs(mask.sum() - hull_main.area) / hull_main.area < 0.05

    unit = hull_main.rnormals / np.linalg.norm(
        hull_main.rnormals, axis=1, keepdims=True
    )
    for e, n in zip(hull_main.edges, unit):
        assert abs(np.dot(e[1] - e[0], n)) < 1e-8


def test_regional_extraction_conserves_flux(sinc2d):
    """Case 3: extracting a hull region out of a sinc image preserves
    the in-mask integral and the peak position."""
    hull = BoundingConvexHull(
        np.array([[-10, 120], [90, 268], [293, 110], [40, -30]])
    )
    data, extents = BoundingConvexHull.regional_data(
        hull, sinc2d, oob_value=np.nan
    )
    assert tuple(extents) == (-10, 293, -30, 268)

    npx = sinc2d.shape[3]
    sm = np.array(hull.sparse_mask)
    sel = ((sm[:, 1] >= 0) & (sm[:, 1] < npx)
           & (sm[:, 0] >= 0) & (sm[:, 0] < npx))
    flat = sm[sel][:, 0] * npx + sm[sel][:, 1]
    integral = sinc2d.ravel()[flat].sum()
    assert abs(integral - np.nansum(data)) < 1e-8

    v = np.nanargmax(data)
    peak = (extents[0] + v % data.shape[3], extents[2] + v // data.shape[3])
    vs = np.nanargmax(sinc2d)
    assert peak == (vs % npx, vs // npx)


def test_hull_overlap_and_containment(hull_main):
    """Cases 4-5: pairwise overlap tests and point containment."""
    bh2 = BoundingConvexHull(np.array([[-20, -120], [0, 60], [40, -60]]))
    bh3 = BoundingConvexHull(np.array([[-20, 58], [-40, 80], [20, 100]]))
    assert hull_main.overlaps_with(bh2)
    assert not hull_main.overlaps_with(bh3)
    assert not bh2.overlaps_with(bh3)

    assert (-1000, -1000) not in hull_main
    assert (30, 0) not in hull_main
    assert (0, 0) not in hull_main
    assert (-40, 30) in hull_main


def test_bounding_box_properties():
    """Case 6: box centre/shape/area/mask and the odd/square factory."""
    bb = BoundingBox(-14, 20, 30, 49)
    assert bb.centre == [3, 39]
    assert bb.box_npx == (35, 20)
    assert bb.mask.shape == bb.box_npx[::-1]
    assert bb.area == 35 * 20
    assert np.sum(bb.mask) == bb.area
    assert (-15, 35) not in bb
    assert (0, 35) in bb

    odd = BoundingBoxFactory.AxisAlignedBoundingBox(bb)
    assert odd.box_npx == (35, 21)
    assert odd.area == 35 * 21
    assert (np.asarray(bb.sparse_mask) == np.asarray(odd.sparse_mask)).all()
    assert (-15, 35) not in odd
    assert (0, 35) in odd

    sq = BoundingBoxFactory.AxisAlignedBoundingBox(bb, square=True)
    assert sq.box_npx[0] == sq.box_npx[1]
    assert sq.box_npx[0] % 2 == 1
    assert sq.area == sq.box_npx[0] ** 2
    assert (np.asarray(bb.sparse_mask) == np.asarray(sq.sparse_mask)).all()


def test_split_and_pad_boxes():
    """Cases 7-8: SplitBox tiles the box exactly; PadBox grows the
    window around the same centre without changing the mask."""
    bb = BoundingBox(-14, 20, 30, 49)
    subs = BoundingBoxFactory.SplitBox(bb, nsubboxes=3)
    assert len(subs) == 9
    xlims = [(c.corners[:, 0].min(), c.corners[:, 0].max())
             for c in subs][0:3]
    ylims = [(c.corners[:, 1].min(), c.corners[:, 1].max())
             for c in subs][0::3]
    assert np.all(np.asarray(xlims) == [(-14, -3), (-2, 9), (10, 20)])
    assert np.all(np.asarray(ylims) == [(30, 36), (37, 43), (44, 49)])
    assert sum(b.area for b in subs) == bb.area
    for b in subs:
        assert b.area == np.sum(b.mask)

    bb5 = BoundingBox(-14, 20, 30, 50)
    assert bb5.box_npx == (35, 21)
    padded = BoundingBoxFactory.PadBox(bb5, 41, 27)
    assert padded.box_npx == (41, 27)
    assert bb5.centre == padded.centre
    assert np.sum(bb5.mask) == np.sum(padded.mask)

    padded_subs = [BoundingBoxFactory.PadBox(b, 17, 11) for b in subs]
    assert all(b.box_npx == (17, 11) for b in padded_subs)
    assert (sum(np.sum(b.mask) for b in padded_subs)
            == sum(np.sum(b.mask) for b in subs))


def test_facet_stitching(sinc2d):
    """Case 9: split a hull into padded facets, extract each and project
    back — flux and the peak location survive the round trip."""
    hull = BoundingConvexHull(
        np.array([[-10, 120], [90, 268], [293, 110], [40, -30]])
    )
    npx = sinc2d.shape[3]
    sm = np.array(hull.sparse_mask)
    sel = ((sm[:, 1] >= 0) & (sm[:, 1] < npx)
           & (sm[:, 0] >= 0) & (sm[:, 0] < npx))
    integral = sinc2d.ravel()[sm[sel][:, 0] * npx + sm[sel][:, 1]].sum()

    regions = [
        BoundingBoxFactory.PadBox(f, 63, 63)
        for f in BoundingBoxFactory.SplitBox(
            BoundingBoxFactory.AxisAlignedBoundingBox(hull), nsubboxes=5
        )
    ]
    facets = [
        BoundingConvexHull.regional_data(r, sinc2d, oob_value=np.nan)
        for r in regions
    ]
    stitched, region = BoundingBox.project_regions(
        [f[0] for f in facets], regions
    )
    assert abs(integral - np.nansum([np.nansum(f[0]) for f in facets])) < 1e-8
    assert abs(integral - np.sum(stitched)) < 1e-8

    v = np.argmax(stitched)
    peak = (
        region.corners[:, 0].min() + v % stitched.shape[3],
        region.corners[:, 1].min() + v // stitched.shape[3],
    )
    vs = np.nanargmax(sinc2d)
    assert peak == (vs % npx, vs // npx)


def test_overlap_normalisation(sinc2d):
    """Case 10: overlapping facets with normalised mask weights co-add
    to unit peak (each pixel's contributions sum to one)."""
    boxes = [
        BoundingBox(110, 138, 110, 135),
        BoundingBox(115, 150, 109, 150),
        BoundingBox(125, 130, 125, 130),
    ]
    BoundingConvexHull.normalize_masks(boxes)
    exts = [
        BoundingConvexHull.regional_data(b, sinc2d)[0] for b in boxes
    ]
    stitched, region = BoundingBox.project_regions(exts, boxes)
    v = np.nanargmax(stitched)
    peak = (
        region.corners[:, 0].min() + v % stitched.shape[3],
        region.corners[:, 1].min() + v // stitched.shape[3],
    )
    npx = sinc2d.shape[3]
    vs = np.nanargmax(sinc2d)
    assert peak == (vs % npx, vs // npx)
    assert abs(1.0 - np.nanmax(stitched)) < 1e-8


def test_regional_data_oob_value_reference_semantics():
    """With a non-zero oob_value, in-extent pixels OUTSIDE the hull take
    data * oob_value (the reference substitutes oob_value for the mask
    zeros, ref geometry.py:252-254) while the padding stays zero for
    finite sentinels (the reference's `zeros * oob_value` quirk)."""
    from africanus_tpu.linalg.geometry import BoundingConvexHull

    data = np.arange(1.0, 1.0 + 20 * 20).reshape(1, 1, 20, 20)
    # a triangle: its bounding box has in-extent out-of-hull corners
    hull = BoundingConvexHull([(4, 4), (14, 4), (4, 14)])
    win, _ = BoundingConvexHull.regional_data(hull, data, oob_value=3.0)

    mask = hull.mask
    inside = mask > 0
    assert inside.any() and (~inside).any()
    sl = win[0, 0]
    miny = int(hull.corners[:, 1].min())
    minx = int(hull.corners[:, 0].min())
    src = data[0, 0, miny:miny + sl.shape[0], minx:minx + sl.shape[1]]
    # inside the hull: data * weight (unit weights on creation)
    np.testing.assert_allclose(sl[inside], (src * mask)[inside])
    # outside the hull but in-extent: data * oob_value
    np.testing.assert_allclose(sl[~inside], src[~inside] * 3.0)


def test_project_regions_shape_mismatch_raises():
    """A region cube smaller than its bounding box must raise (the
    reference's shape check) rather than stitch at the box corner."""
    import pytest as _pytest
    from africanus_tpu.linalg.geometry import BoundingBox

    box = BoundingBox(0, 9, 0, 9)
    bad = np.ones((1, 1, 5, 5))
    with _pytest.raises(ValueError, match="bounding box"):
        BoundingBox.project_regions([bad], [box])
