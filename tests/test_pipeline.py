"""Pipeline API tests (SURVEY §2.10 extension surface)."""

import pyarrow as pa
import pytest
import ray.data

from tbl_ray.pipeline import BATCH_OPS, Pipeline, register_op


def test_pipeline_fuses_and_matches_manual(ray_session, sf_dir, duck):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = (
        Pipeline()
        .step("filter", exprs=["lang=en"])
        .step("token_count")
        .step("select", columns=["doc_id", "n_tokens"])
        (ds)
    )
    got = pa.Table.from_pylist(out.take_all()).sort_by("doc_id")
    want = duck.execute(
        "SELECT doc_id, len(regexp_extract_all(text, '\\S+')) n FROM documents"
        " WHERE lang = 'en' ORDER BY doc_id"
    ).fetch_arrow_table()
    assert got.column("doc_id").to_pylist() == want.column("doc_id").to_pylist()
    assert got.column("n_tokens").to_pylist() == want.column("n").to_pylist()


def test_pipeline_mixed_batch_dataset_ops(ray_session, sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = (
        Pipeline()
        .step("token_count")
        .step("sample_uniform", n=25, id_col="doc_id", seed=3)
        .step("select", columns=["doc_id", "n_tokens"])
        (ds)
    )
    rows = out.take_all()
    assert len(rows) == 25 and all("n_tokens" in r for r in rows)


def test_pipeline_user_registered_op(ray_session):
    @register_op("double_v")
    def double_v(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(
            t.schema.get_field_index("v"), "v", pc.multiply(t.column("v"), 2)
        )

    try:
        ds = ray.data.from_arrow(pa.table({"v": [1, 2, 3]}))
        out = Pipeline().step("double_v").step("double_v")(ds)
        assert sorted(r["v"] for r in out.take_all()) == [4, 8, 12]
    finally:
        BATCH_OPS.pop("double_v", None)


def test_pipeline_unknown_op_raises():
    with pytest.raises(KeyError):
        Pipeline().step("no_such_op")


def test_pipeline_is_immutable():
    p = Pipeline()
    p2 = p.step("token_count")
    assert p._steps == [] and len(p2._steps) == 1


def test_curate_webtext_full_funnel(sf_dir):
    """All optional stages on: line dedup -> PII redact -> sample -> pack."""
    import ray.data

    from tbl_ray.pipelines.webtext import WebtextConfig, curate_webtext

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    kept, report = curate_webtext(
        ds,
        cfg=WebtextConfig(
            languages=[],
            min_quality=0.0,
            sample_n=100,
            redact_pii=True,
            line_dedup_min_count=10**9,  # no-op threshold; exercises the stage
            line_dedup_sep=" ",
            pack_max_tokens=256,
        ),
        audit_counts=True,
    )
    rows = kept.take_all()
    assert rows and set(rows[0]) >= {"seq_id", "text", "n_docs", "n_tokens"}
    assert sum(r["n_docs"] for r in rows) == report["after_sample"]
    assert report["after_pack"] == len(rows)


def _funnel_cfg():
    from tbl_ray.pipelines.webtext import WebtextConfig

    return WebtextConfig(languages=[], min_quality=0.0, minhash_threshold=0.9)


def _docs_ds(sf_dir):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _canon_rows(kept):
    rows = sorted(kept.take_all(), key=lambda r: r["doc_id"])
    return [(r["doc_id"], r["text"]) for r in rows]


def test_funnel_checkpoint_equals_clean_run(sf_dir, tmp_path):
    from tbl_ray.pipelines.webtext import curate_webtext

    clean, _ = curate_webtext(_docs_ds(sf_dir), cfg=_funnel_cfg())
    ck = str(tmp_path / "ckpt")
    ckpt, report = curate_webtext(
        _docs_ds(sf_dir), cfg=_funnel_cfg(), checkpoint_dir=ck
    )
    assert _canon_rows(clean) == _canon_rows(ckpt)
    import os

    for stage in ("00_filter", "01_exact_dedup", "02_minhash_dedup"):
        assert os.path.exists(os.path.join(ck, stage, "_DONE.json")), stage


def test_funnel_checkpoint_kill_resume(sf_dir, tmp_path, monkeypatch):
    """A run killed mid-funnel (minhash stage dies) resumed with the same
    cfg equals a clean run — and the completed stages are NOT recomputed."""
    import os

    import pytest

    import tbl_ray.pipelines.webtext as wt

    clean, _ = wt.curate_webtext(_docs_ds(sf_dir), cfg=_funnel_cfg())
    ck = str(tmp_path / "ckpt")

    real_minhash = wt.minhash_dedup

    def dying_minhash(*a, **k):
        raise RuntimeError("simulated mid-funnel death")

    monkeypatch.setattr(wt, "minhash_dedup", dying_minhash)
    with pytest.raises(RuntimeError, match="simulated"):
        wt.curate_webtext(_docs_ds(sf_dir), cfg=_funnel_cfg(), checkpoint_dir=ck)
    assert os.path.exists(os.path.join(ck, "01_exact_dedup", "_DONE.json"))
    assert not os.path.exists(os.path.join(ck, "02_minhash_dedup"))

    # resume: completed stages must be READ, not recomputed
    calls = {"exact": 0}
    real_exact = wt.exact_dedup

    def counting_exact(*a, **k):
        calls["exact"] += 1
        return real_exact(*a, **k)

    monkeypatch.setattr(wt, "exact_dedup", counting_exact)
    monkeypatch.setattr(wt, "minhash_dedup", real_minhash)
    resumed, _ = wt.curate_webtext(
        _docs_ds(sf_dir), cfg=_funnel_cfg(), checkpoint_dir=ck
    )
    assert calls["exact"] == 0
    assert _canon_rows(clean) == _canon_rows(resumed)


def test_funnel_checkpoint_cfg_change_invalidates(sf_dir, tmp_path):
    """A different cfg must not reuse stale stage outputs."""
    from tbl_ray.pipelines.webtext import WebtextConfig, curate_webtext

    ck = str(tmp_path / "ckpt")
    loose, _ = curate_webtext(
        _docs_ds(sf_dir),
        cfg=WebtextConfig(languages=[], min_quality=0.0),
        checkpoint_dir=ck,
    )
    # the returned dataset STREAMS from the checkpoint files — consume it
    # before a different-cfg rerun invalidates them (documented contract)
    loose_rows = _canon_rows(loose)
    strict_cfg = WebtextConfig(languages=[], min_quality=0.99)
    strict_ck, _ = curate_webtext(
        _docs_ds(sf_dir), cfg=strict_cfg, checkpoint_dir=ck
    )
    strict_clean, _ = curate_webtext(_docs_ds(sf_dir), cfg=strict_cfg)
    assert _canon_rows(strict_ck) == _canon_rows(strict_clean)
    assert len(_canon_rows(strict_ck)) < len(loose_rows)


def test_funnel_checkpoint_eval_tag_invalidates(sf_dir, tmp_path):
    """The decontamination checkpoint key includes the eval-set identity:
    same cfg + different eval set must recompute, not reuse."""
    import pyarrow.compute as pc

    from tbl_ray.pipelines.webtext import WebtextConfig, curate_webtext

    cfg = WebtextConfig(
        languages=[], min_quality=0.0,
        line_dedup_min_count=10**9, line_dedup_sep=" ",
    )

    def eval_ds(hi):
        def head(t):
            return t.filter(pc.less(t.column("doc_id"), hi))

        return _docs_ds(sf_dir).map_batches(head, batch_format="pyarrow")

    ck = str(tmp_path / "ckpt")
    small, _ = curate_webtext(
        _docs_ds(sf_dir), cfg=cfg, eval_ds=eval_ds(5),
        checkpoint_dir=ck, eval_tag="eval-v1",
    )
    small_rows = _canon_rows(small)
    big, _ = curate_webtext(
        _docs_ds(sf_dir), cfg=cfg, eval_ds=eval_ds(100),
        checkpoint_dir=ck, eval_tag="eval-v2",
    )
    big_rows = _canon_rows(big)
    clean_big, _ = curate_webtext(
        _docs_ds(sf_dir), cfg=cfg, eval_ds=eval_ds(100)
    )
    assert big_rows == _canon_rows(clean_big)
    assert len(big_rows) < len(small_rows)


def test_funnel_checkpoint_eval_needs_tag_when_not_file_backed(sf_dir, tmp_path):
    import pyarrow as pa
    import pytest
    import ray.data

    from tbl_ray.pipelines.webtext import WebtextConfig, curate_webtext

    cfg = WebtextConfig(
        languages=[], min_quality=0.0,
        line_dedup_min_count=10**9, line_dedup_sep=" ",
    )
    ev = ray.data.from_arrow(pa.table({"text": ["some eval document"]}))
    with pytest.raises(ValueError, match="eval_tag"):
        curate_webtext(
            _docs_ds(sf_dir), cfg=cfg, eval_ds=ev,
            checkpoint_dir=str(tmp_path / "ck"),
        )
