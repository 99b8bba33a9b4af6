"""Grounding datapoint schema + query-filter transforms (reference
sam3/train/transforms/filter_query_transforms.py semantics)."""

import numpy as np
import pytest

from skix.data.grounding import (
    AddPrefixSuffixToFindText,
    Datapoint,
    FilterCrowds,
    FilterEmptyTargets,
    FilterFindQueriesWithTooManyOut,
    FilterInvalidGeometricQueries,
    FilterNonExhaustiveFindQueries,
    FilterQueryWithText,
    FilterZeroBoxQueries,
    FindQuery,
    FlexibleFilterFindGetQueries,
    GroundingImage,
    GroundingObject,
    KeepMaxNumFindQueries,
    KeepSemanticFindQueriesOnly,
    OverwriteTextQuery,
    RemoveInputBoxes,
    TextQueryToVisual,
    datapoint_from_coco,
)


def _obj(x1=0, y1=0, x2=10, y2=10, area=None, crowd=False):
    a = (x2 - x1) * (y2 - y1) if area is None else area
    return GroundingObject(bbox=np.array([x1, y1, x2, y2], np.float32),
                           area=float(a), is_crowd=crowd)


def _dp():
    """2 images, 5 objects, 4 queries (one geometric, one negative)."""
    img0 = GroundingImage(objects=[_obj(), _obj(5, 5, 20, 20),
                                   _obj(0, 0, 0, 8)])  # obj 2: zero width
    img1 = GroundingImage(objects=[_obj(), _obj(crowd=True)])
    return Datapoint(
        images=[img0, img1],
        find_queries=[
            FindQuery("skier", image_id=0, object_ids_output=[0, 1]),
            FindQuery("snow", image_id=0, object_ids_output=[2]),
            FindQuery("geometric", image_id=1, object_ids_output=[0],
                      input_bbox=np.array([0, 0, 5, 5], np.float32)),
            FindQuery("empty", image_id=1, object_ids_output=[]),
        ])


class TestFilters:
    def test_text_filter(self):
        dp = _dp()
        f = FilterQueryWithText(exclude_find_keys=["snow"])
        f.identify_queries_to_filter(dp)
        assert f.find_ids_to_filter == {1}

    def test_zero_box_filter(self):
        dp = _dp()
        f = FilterZeroBoxQueries()
        f.identify_queries_to_filter(dp)
        assert f.find_ids_to_filter == {1}  # "snow" outputs the zero box

    def test_semantic_only(self):
        dp = _dp()
        f = KeepSemanticFindQueriesOnly()
        f.identify_queries_to_filter(dp)
        assert f.find_ids_to_filter == {2}

    def test_too_many_out(self):
        dp = _dp()
        f = FilterFindQueriesWithTooManyOut(max_num_objects=1)
        f.identify_queries_to_filter(dp)
        assert f.find_ids_to_filter == {0}

    def test_empty_targets_and_crowds(self):
        dp = _dp()
        dp.images[0].objects[2].area = 0.0
        f = FilterEmptyTargets()
        f.identify_queries_to_filter(dp)
        assert f.obj_ids_to_filter == {(0, 2)}
        g = FilterCrowds()
        g.identify_queries_to_filter(dp)
        assert g.obj_ids_to_filter == {(1, 1)}

    def test_non_exhaustive(self):
        dp = _dp()
        dp.find_queries[0].is_exhaustive = False
        dp.find_queries[1].is_pixel_exhaustive = False
        f = FilterNonExhaustiveFindQueries("instance")
        f.identify_queries_to_filter(dp)
        assert f.find_ids_to_filter == {0}
        g = FilterNonExhaustiveFindQueries("pixel")
        g.identify_queries_to_filter(dp)
        assert g.find_ids_to_filter == {1}  # None stays kept

    def test_invalid_geometric(self):
        dp = _dp()
        dp.find_queries[2].object_ids_output = []
        f = FilterInvalidGeometricQueries()
        f.identify_queries_to_filter(dp)
        assert f.find_ids_to_filter == {2}

    def test_keep_max_num_retain_positive(self):
        rng = np.random.default_rng(3)
        dp = _dp()
        f = KeepMaxNumFindQueries(3, retain_positive_queries=True, rng=rng)
        f.identify_queries_to_filter(dp)
        # 3 positive queries exactly fill the budget → the negative is cut
        assert f.find_ids_to_filter == {3}
        g = KeepMaxNumFindQueries(2, retain_positive_queries=True, rng=rng)
        g.identify_queries_to_filter(dp)
        assert len(g.find_ids_to_filter) == 2
        assert 3 in g.find_ids_to_filter  # negatives go first


class TestFlexibleApply:
    def test_remaps_objects_and_images(self):
        dp = _dp()
        out = FlexibleFilterFindGetQueries(
            FilterQueryWithText(exclude_find_keys=["skier"]))(dp)
        # "skier" (outputs 0,1 of image 0) dropped → only object 2 of
        # image 0 stays referenced, remapped to id 0
        assert [q.query_text for q in out.find_queries] == [
            "snow", "geometric", "empty"]
        assert len(out.images[0].objects) == 1
        assert out.find_queries[0].object_ids_output == [0]

    def test_drops_unreferenced_images(self):
        dp = _dp()
        out = FlexibleFilterFindGetQueries(
            FilterQueryWithText(exclude_find_keys=["geometric", "empty"]))(dp)
        assert len(out.images) == 1
        assert all(q.image_id == 0 for q in out.find_queries)

    def test_obj_drop_remaps_query_outputs(self):
        dp = _dp()
        out = FlexibleFilterFindGetQueries(FilterEmptyTargets())(dp)
        dp2 = _dp()
        dp2.images[0].objects[0].area = 0.0  # drop object 0 of image 0
        out = FlexibleFilterFindGetQueries(FilterEmptyTargets())(dp2)
        # "skier" outputs [0, 1] → object 0 removed, 1 remapped to 0
        assert out.find_queries[0].object_ids_output == [0]

    def test_all_filtered_raises(self):
        dp = _dp()
        with pytest.raises(ValueError):
            FlexibleFilterFindGetQueries(FilterQueryWithText(
                exclude_find_keys=["skier", "snow", "geometric", "empty"]))(dp)

    def test_processing_order_recompacted(self):
        dp = _dp()
        dp.find_queries[2].query_processing_order = 2
        dp.find_queries[3].query_processing_order = 2
        out = FlexibleFilterFindGetQueries(
            FilterQueryWithText(exclude_find_keys=["snow"]))(dp)
        orders = [q.query_processing_order for q in out.find_queries]
        assert orders == [0, 1, 1]

    def test_disabled_passthrough(self):
        dp = _dp()
        out = FlexibleFilterFindGetQueries(
            FilterQueryWithText(exclude_find_keys=["skier"]),
            enabled=False)(dp)
        assert len(out.find_queries) == 4


class TestTextRewrites:
    def test_prefix_suffix_conditional(self):
        dp = _dp()
        AddPrefixSuffixToFindText(prefix="a ", suffix=" on snow",
                                  condition_on_text=True,
                                  condition_text_list=["Skier"])(dp)
        assert dp.find_queries[0].query_text == "a skier on snow"
        assert dp.find_queries[1].query_text == "snow"
        assert dp.find_queries[2].query_text == "geometric"  # skipped

    def test_text_to_visual(self):
        dp = _dp()
        TextQueryToVisual(probability=1.0,
                          rng=np.random.default_rng(0))(dp)
        q = dp.find_queries[0]
        assert q.query_text == "visual" and q.input_bbox is not None
        # geometric + negative queries untouched
        assert dp.find_queries[3].input_bbox is None

    def test_remove_and_overwrite(self):
        dp = _dp()
        RemoveInputBoxes()(dp)
        assert all(q.input_bbox is None for q in dp.find_queries)
        OverwriteTextQuery("person", probability=1.0)(dp)
        assert all(q.query_text == "person" for q in dp.find_queries)


class TestCocoBridge:
    def test_bridge(self):
        rec = {"image": np.zeros((8, 8, 3), np.uint8),
               "boxes": np.array([[0, 0, 4, 4], [2, 2, 8, 8]], np.float32),
               "cls": np.zeros(2, np.int32),
               "masks": np.ones((2, 8, 8), bool)}
        dp = datapoint_from_coco(rec, query_text="skier")
        assert len(dp.images[0].objects) == 2
        assert dp.find_queries[0].object_ids_output == [0, 1]
        assert dp.images[0].objects[0].area == 64.0  # mask area wins
