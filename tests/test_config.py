from atlas_tpu.config import AtlasConfig
from atlas_tpu.utils.schedules import (
    IndexRefreshScheduler,
    lr_schedule,
    parse_index_refresh_schedule_string,
)
from atlas_tpu.utils.stats import WeightedAvgStats


def test_defaults_match_reference():
    cfg = AtlasConfig()
    assert cfg.per_gpu_batch_size == 1
    assert cfg.per_gpu_embedder_batch_size == 512
    assert cfg.gold_score_mode == "ppmean"
    assert cfg.encoder_format == "{query} title: {title} context: {text}"
    assert cfg.retriever_format == "{title} {text}"
    assert cfg.filtering_overretrieve_ratio == 2
    assert cfg.n_to_rerank_with_retrieve_with_rerank == 128
    assert cfg.save_index_n_shards == 128


def test_closed_book_overrides():
    cfg = AtlasConfig(closed_book=True, n_context=40, retriever_n_context=40).finalize()
    assert cfg.n_context == 1
    assert cfg.retriever_n_context == 1
    assert cfg.encoder_format == "{query}"
    assert cfg.use_file_passages


def test_fp16_refused_loudly():
    """--precision fp16 has no loss scaler here (TPU is natively bf16); it must
    be rejected at finalize, not silently diverge (reference train.py:49,96-116
    pairs fp16 with a dynamic scaler)."""
    import pytest

    with pytest.raises(ValueError, match="bf16"):
        AtlasConfig(precision="fp16").finalize()
    assert AtlasConfig(precision="bf16").finalize().precision == "bf16"


def test_paper_alias_score_modes():
    assert AtlasConfig(gold_score_mode="pdist").finalize().gold_score_mode == "ppmean"
    assert AtlasConfig(gold_score_mode="adist").finalize().gold_score_mode == "evalnormsum"


def test_use_file_passages_disables_retriever_flags():
    cfg = AtlasConfig(
        use_file_passages=True, train_retriever=True, query_side_retriever_training=True
    ).finalize()
    assert not cfg.train_retriever
    assert not cfg.query_side_retriever_training


def test_cli_roundtrip():
    cfg = AtlasConfig.from_args(
        ["--task", "qa", "--n_context", "40", "--train_data", "a.jsonl", "b.jsonl", "--shuffle"]
    )
    assert cfg.task == "qa"
    assert cfg.n_context == 40
    assert cfg.train_data == ["a.jsonl", "b.jsonl"]
    assert cfg.shuffle


def test_refresh_schedule_parsing():
    assert parse_index_refresh_schedule_string("-1") == [(0, 2**32, 2**32)]
    assert parse_index_refresh_schedule_string("100") == [(0, 2**32, 100)]
    assert parse_index_refresh_schedule_string("0-100:10,100-1000000:500") == [
        (0, 100, 10),
        (100, 1000000, 500),
    ]


def test_refresh_scheduler_semantics():
    s = IndexRefreshScheduler("0-100:10,100-1000:500", freeze_retriever_steps=-1, train_retriever=True)
    assert s.is_time_to_refresh(0)
    assert s.is_time_to_refresh(10)
    assert not s.is_time_to_refresh(11)
    assert s.is_time_to_refresh(100)
    assert s.is_time_to_refresh(600)
    assert not s.is_time_to_refresh(610)
    # untrained retriever: only step 0
    s2 = IndexRefreshScheduler("10", freeze_retriever_steps=-1, train_retriever=False)
    assert s2.is_time_to_refresh(0)
    assert not s2.is_time_to_refresh(10)
    # frozen retriever: no refresh before freeze_retriever_steps except step 0
    s3 = IndexRefreshScheduler("10", freeze_retriever_steps=50, train_retriever=True)
    assert s3.is_time_to_refresh(0)
    assert not s3.is_time_to_refresh(20)
    assert s3.is_time_to_refresh(50)


def test_lr_schedules():
    lin = lr_schedule("linear", warmup=10, total=100)
    assert abs(lin(0) - 0.1) < 1e-9  # starts at ratio
    assert abs(lin(10) - 1.0) < 1e-9
    assert lin(100) < lin(50) < lin(10)
    cos = lr_schedule("cosine", warmup=10, total=100)
    assert cos(0) == 0.0
    assert abs(cos(10) - 1.0) < 1e-9
    assert abs(cos(100) - 0.1) < 1e-9
    fix = lr_schedule("fixed", warmup=10, total=100)
    assert fix(5) == 0.5
    assert fix(50) == 1.0


def test_weighted_avg_stats():
    s = WeightedAvgStats()
    s.update({"loss": (2.0, 1), "acc": (0.5, 4)})
    s.update({"loss": (4.0, 3)})
    assert abs(s.stats["loss"] - 3.5) < 1e-9
    assert abs(s.stats["acc"] - 0.5) < 1e-9
    assert s.average_stats["loss"] == s.stats["loss"]  # single-process
    s.reset()
    assert s.raw_stats == {}
