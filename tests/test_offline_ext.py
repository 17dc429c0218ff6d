"""Extended offline metrics tests (metrics2/metrics3 feature set)."""

import numpy as np
import pytest

from cikm2020_dmt_tpu.metrics import offline
from cikm2020_dmt_tpu.metrics.offline_ext import (GRID_WEIGHTS, grid_search,
                                                  mix_auc,
                                                  precision_mrr_grouped,
                                                  save_scores_csv,
                                                  separate_metrics,
                                                  weighted_grouped_auc)

from test_offline_metrics import SCHEMA, _make_headers


@pytest.fixture()
def case():
    rng = np.random.default_rng(11)
    n = 500
    sids = rng.integers(0, 60, n)
    uuids = rng.integers(0, 30, n)
    labels = rng.choice([0, 0, 0, 1, 2, 4, 5], n)
    clk = np.clip(rng.random(n) + 0.2 * (labels >= 2), 0, 1)
    ordr = np.clip(rng.random(n) + 0.2 * (labels >= 5), 0, 1)
    return _make_headers(sids, uuids, labels), labels, uuids, clk, ordr


class TestWeightedGroupedAUC:
    def test_impression_weighting_oracle(self, case):
        headers, labels, uuids, clk, _ = case
        got = weighted_grouped_auc(SCHEMA, headers, clk,
                                   weight_method="impression")
        # oracle
        total, total_w = 0.0, 0.0
        y = (labels >= offline.CLICK).astype(int)
        for u in np.unique(uuids):
            m = uuids == u
            if m.sum() == 1:
                continue
            w = float(m.sum())
            if len(np.unique(y[m])) < 2:
                auc = 1.0
            else:
                from sklearn.metrics import roc_auc_score
                auc = roc_auc_score(y[m], clk[m])
            total += auc * w
            total_w += w
        np.testing.assert_allclose(got[offline.CLICK], total / total_w,
                                   rtol=1e-9)

    def test_click_weighting_excludes_clickless_groups(self):
        # group with zero clicks gets weight 0 under "click"
        headers = _make_headers([0, 0, 1, 1], [1, 1, 2, 2], [0, 0, 2, 0])
        scores = [0.1, 0.9, 0.8, 0.2]
        got = weighted_grouped_auc(SCHEMA, headers, scores,
                                   weight_method="click")
        # only uuid=2 contributes (1 click): perfect ordering -> 1.0
        assert got[offline.CLICK] == 1.0


class TestGridSearch:
    def test_grid_structure_and_best(self, case, tmp_path):
        headers, labels, uuids, clk, ordr = case
        out_file = str(tmp_path / "grid.txt")
        res = grid_search(SCHEMA, headers, clk, ordr, out_file=out_file)
        assert len(res["cells"]) == len(GRID_WEIGHTS)
        assert res["max_key"] in res["cells"]
        best_cell = res["cells"][res["max_key"]]
        p4 = best_cell["precision_mrr"][offline.CLICK][0][
            offline.AT_LIST.index(4)]
        np.testing.assert_allclose(res["max_value"], p4, rtol=1e-12)
        # every cell carries the full metric family
        for cell in res["cells"].values():
            assert set(cell) >= {"precision_mrr", "mix_auc", "grouped_auc",
                                 "grouped_auc_impression",
                                 "grouped_auc_click", "grouped_auc_f1"}
        with open(out_file) as f:
            text = f.read()
        assert "max_key:" in text and "group_weightClk_user_auc_clk" in text

    def test_blend_formula(self, case):
        headers, labels, uuids, clk, ordr = case
        res = grid_search(SCHEMA, headers, clk, ordr,
                          weights=((1.0, 4.0),))
        blended = (1.0 * clk + 4.0 * ordr) / 5.0
        want = mix_auc(SCHEMA, headers, blended)
        got = res["cells"]["1.0_4.0"]["mix_auc"]
        np.testing.assert_allclose(got[offline.CLICK], want[offline.CLICK],
                                   rtol=1e-12)


class TestSeparateMetrics:
    def test_each_head_uses_own_score(self, case):
        headers, labels, uuids, clk, ordr = case
        sep = separate_metrics(SCHEMA, headers, clk, ordr)
        want_clk = precision_mrr_grouped(SCHEMA, headers, clk,
                                         group_by=("uuid", "sid"))
        want_ord = precision_mrr_grouped(SCHEMA, headers, ordr,
                                         group_by=("uuid", "sid"))
        np.testing.assert_allclose(sep[offline.CLICK][0],
                                   want_clk[offline.CLICK][0])
        np.testing.assert_allclose(sep[offline.ORDER][0],
                                   want_ord[offline.ORDER][0])

    def test_group_by_composite_differs_from_sid(self, case):
        headers, labels, uuids, clk, _ = case
        by_sid = precision_mrr_grouped(SCHEMA, headers, clk, group_by="sid")
        by_both = precision_mrr_grouped(SCHEMA, headers, clk,
                                        group_by=("uuid", "sid"))
        # random sid/uuid assignment: composite grouping has more groups
        assert not np.allclose(by_sid[offline.CLICK][0],
                               by_both[offline.CLICK][0])


class TestCSV:
    def test_save_scores_csv(self, case, tmp_path):
        headers, labels, uuids, clk, ordr = case
        path = str(tmp_path / "scores.csv")
        save_scores_csv(path, SCHEMA, headers, clk, ordr)
        with open(path) as f:
            lines = f.read().strip().split("\n")
        assert lines[0] == "uuid\tsid\tlabel\tclick_score\torder_score"
        assert len(lines) == len(headers) + 1
        first = lines[1].split("\t")
        assert float(first[3]) == pytest.approx(clk[0])


class TestCellGroupedAUCs:
    def test_matches_standalone_functions(self, case):
        """_cell_grouped_aucs (one shared lexsort per grid cell) must equal
        grouped_auc + both weighted_grouped_auc variants exactly."""
        from cikm2020_dmt_tpu.metrics.offline_ext import _cell_grouped_aucs
        headers, labels, uuids, clk, ordr = case
        blended = (1.0 * clk + 0.5 * ordr) / 1.5
        ph = offline.parse_headers(SCHEMA, headers)
        plain, w_imp, w_clk = _cell_grouped_aucs(ph, blended)
        ref_plain = offline.grouped_auc(SCHEMA, ph, blended, "uuid")
        ref_imp = weighted_grouped_auc(SCHEMA, ph, blended,
                                       weight_method="impression")
        ref_clk = weighted_grouped_auc(SCHEMA, ph, blended,
                                       weight_method="click")
        for a in (offline.CLICK, offline.ORDER):
            assert plain[a] == pytest.approx(ref_plain[a], abs=1e-12)
            assert w_imp[a] == pytest.approx(ref_imp[a], abs=1e-12)
            assert w_clk[a] == pytest.approx(ref_clk[a], abs=1e-12)

    def test_empty_split(self):
        from cikm2020_dmt_tpu.metrics.offline_ext import _cell_grouped_aucs
        ph = offline.parse_headers(SCHEMA, [])
        plain, w_imp, w_clk = _cell_grouped_aucs(ph, np.zeros(0))
        for d in (plain, w_imp, w_clk):
            assert d[offline.CLICK] == 0.0 and d[offline.ORDER] == 0.0
