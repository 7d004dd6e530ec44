"""Pure-pandas unit tests for the per-key LWW fold.

The vectorized singles path (fold_singles) must agree case-for-case with
the sequential path (fold_multi -> fold_key_events, the semantic core
shared with the replay oracle).  Spark-free and fast: this is the guard
that lets the engine take the numpy fast path for 90+% of keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tis_spark.cdc.fold import FOLD_SCHEMA, fold_multi, fold_singles, make_fold_fn
from tis_spark.cdc.semantics import CdcConfig

US = 1_000_000
T0 = 1_700_000_000 * US  # some epoch-us base

COLS = [
    "url", "seq", "op", "sv", "invalid", "noop",
    "a_warc_ts_us", "a_html", "a_lang", "a_fetch_status", "a_score",
    "s_warc_ts_us", "s_html", "s_lang", "s_fetch_status", "s_score",
]


def _row(url, seq, op, sv=1, invalid=False, noop=False, v=None, stored_v=None, **kw):
    r = dict.fromkeys(COLS)
    r.update(
        url=url, seq=seq, op=op, sv=sv, invalid=invalid, noop=noop,
        a_warc_ts_us=v,
        a_html=kw.get("a_html", b"<html>x</html>" if op != "D" else None),
        a_lang=kw.get("a_lang", "en" if op != "D" else None),
        a_fetch_status=kw.get("a_fetch_status"),
        a_score=kw.get("a_score"),
        s_warc_ts_us=stored_v,
        s_html=kw.get("s_html", b"<html>old</html>" if stored_v is not None else None),
        s_lang=kw.get("s_lang", "de" if stored_v is not None else None),
        s_fetch_status=kw.get("s_fetch_status"),
        s_score=kw.get("s_score"),
    )
    return r


def _random_rows(rng: np.random.Generator, n: int) -> list[dict]:
    rows = []
    for i in range(n):
        op = rng.choice(["I", "U", "D"], p=[0.4, 0.45, 0.15])
        has_stored = rng.random() < 0.5
        stored_v = T0 + int(rng.integers(0, 3600 * US)) if has_stored else None
        v = None
        if op != "D":
            # cover newer / rectify-window / dirty version relations
            base = stored_v if stored_v is not None else T0
            v = base + int(rng.integers(-3600 * US, 3600 * US))
        rows.append(
            _row(
                f"u{i}", i + 1, op,
                sv=int(rng.integers(1, 6)),
                invalid=(op == "U" and rng.random() < 0.1),
                noop=(op == "U" and rng.random() < 0.1),
                v=v, stored_v=stored_v,
                a_fetch_status=int(rng.integers(100, 600)) if rng.random() < 0.7 else None,
                a_score=float(rng.random() * 100) if rng.random() < 0.7 else None,
                s_fetch_status=int(rng.integers(100, 600)) if has_stored and rng.random() < 0.7 else None,
                s_score=float(rng.random() * 100) if has_stored and rng.random() < 0.7 else None,
            )
        )
    return rows


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = [f.name for f in FOLD_SCHEMA.fields]
    out = df[cols].sort_values("url").reset_index(drop=True)
    return out.astype(object).where(pd.notna(out), None)


@pytest.mark.parametrize("policy", ["ignore", "delete"])
@pytest.mark.parametrize("upsert_missing", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_singles_path_matches_sequential(policy, upsert_missing, seed):
    cfg = CdcConfig(delete_policy=policy, upsert_missing=upsert_missing)
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(_random_rows(rng, 500), dtype=object)
    fast = _normalize(fold_singles(pdf, cfg))
    ref = _normalize(fold_multi(pdf, cfg))
    pd.testing.assert_frame_equal(fast, ref, check_dtype=False)


def test_fold_pdf_routes_and_dedups():
    cfg = CdcConfig()
    rows = [
        _row("a", 1, "I", v=T0),
        _row("a", 2, "U", v=T0 + US, stored_v=None),  # multi-event key
        _row("a", 2, "U", v=T0 + US, stored_v=None),  # duplicate seq (redelivery)
        _row("b", 3, "I", v=T0),  # single key
    ]
    out = make_fold_fn(cfg)(pd.DataFrame(rows, dtype=object)).set_index("url")
    assert out.loc["a", "n_events"] == 2  # dup dropped
    assert out.loc["a", "action"] == "U"
    assert out.loc["a", "n_sticky_insert"] == 1  # I+U coalesce to insert
    assert out.loc["b", "n_events"] == 1
    assert int(out.loc["a", "warc_ts_us"]) == T0 + US


def test_rectification_corner_exact():
    """Equal versions rectify (+tick); beyond the bound drops as dirty."""
    cfg = CdcConfig()
    same = pd.DataFrame([_row("x", 1, "U", v=T0, stored_v=T0)], dtype=object)
    out = fold_singles(same, cfg)
    assert out["n_rectified"][0] == 1
    assert int(out["warc_ts_us"][0]) == T0 + cfg.rectify_tick_s * US

    old = pd.DataFrame(
        [_row("x", 1, "U", v=T0 - (cfg.rectify_bound_s + 1) * US, stored_v=T0)], dtype=object
    )
    out = fold_singles(old, cfg)
    assert out["n_dirty"][0] == 1 and out["action"][0] == "N"
