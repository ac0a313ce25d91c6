"""YAML job config loading + validation (config_io.py; reference
Load/Validate parity, config.go:81-148)."""

import os

import pytest

from mcp_ocr_server_spark.config import JobConfig
from mcp_ocr_server_spark.config_io import (
    ConfigError,
    job_config_from_dict,
    load_job_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_example_config_loads():
    cfg = load_job_config(os.path.join(REPO, "configs", "job.yaml"))
    assert cfg.ocr.language == "eng+chi_sim+chi_tra+jpn"
    assert cfg.ocr.psm == 3 and cfg.ocr.oem == 3
    assert cfg.ocr.max_image_size == 10 * 1024 * 1024
    assert cfg.preprocessing.binarization_mode == "otsu"
    assert cfg.preprocessing.skew_method == "hough+profile"
    assert cfg.cache.enabled and cfg.cache.max_entries == 100
    assert cfg.media_partitions == 32


def test_empty_doc_gives_reference_defaults():
    cfg = job_config_from_dict({})
    dflt = JobConfig()
    assert cfg.ocr == dflt.ocr
    assert cfg.preprocessing == dflt.preprocessing
    assert cfg.cache == dflt.cache


@pytest.mark.parametrize(
    "doc, msg",
    [
        ({"ocr": {"engine": "easyocr"}}, "unsupported OCR engine"),
        ({"ocr": {"max_image_size": 0}}, "invalid max_image_size"),
        ({"ocr": {"timeout": -1}}, "invalid timeout"),
        ({"preprocessing": {"binarization_mode": "sauvola"}},
         "invalid binarization_mode"),
        ({"preprocessing": {"adaptive_block_size": 10}},
         "invalid adaptive_block_size"),
        ({"preprocessing": {"skew_method": "fft"}}, "invalid skew_method"),
        ({"performance": {"cache_enabled": True, "cache_size": 0}},
         "invalid cache_size"),
        ({"performance": {"worker_pool_size": 0}},
         "invalid worker_pool_size"),
        ({"performance": {"queue_size": 0}}, "invalid queue_size"),
        ({"spark": {"checkpoint_buckets": 0}}, "invalid checkpoint_buckets"),
    ],
)
def test_validation_errors(doc, msg):
    with pytest.raises(ConfigError, match=msg):
        job_config_from_dict(doc)


def test_quality_thresholds_and_spark_overrides():
    cfg = job_config_from_dict(
        {
            "preprocessing": {"quality_thresholds": {"sharpness": 55.0}},
            "performance": {"worker_pool_size": 8},
            "spark": {"media_partitions": 64, "checkpoint_buckets": 128},
        }
    )
    assert cfg.preprocessing.sharpness_threshold == 55.0
    # explicit spark.media_partitions beats the worker_pool_size mapping
    assert cfg.media_partitions == 64
    assert cfg.checkpoint_buckets == 128
    # without the spark override, pool size maps through
    cfg2 = job_config_from_dict({"performance": {"worker_pool_size": 8}})
    assert cfg2.media_partitions == 8
