"""YAML job-config loading + validation (config.go:81-148 parity).

The reference loads `configs/config.yaml` into nested structs and
validates before serving (internal/config/config.go: Load at 81-106,
Validate at 108-148).  This module gives the Spark job the same
file-driven configuration surface, mapped onto JobConfig:

  ocr.*                  -> OCRConfig (language, page_seg_mode->psm,
                            engine_mode->oem, whitelist->char_whitelist,
                            max_image_size, timeout->timeout_seconds)
  preprocessing.*        -> PreprocessingConfig (incl.
                            quality_thresholds.{sharpness,contrast,
                            brightness})
  performance.*          -> cache settings; worker_pool_size maps to
                            media_partitions (the reference's worker
                            pool IS Spark task scheduling, SURVEY §2.6
                            P2); queue_size is accepted-and-ignored
                            (backpressure is Spark's scheduler's job)
  spark.* (extension)    -> media_partitions / checkpoint_buckets /
                            arrow_max_records_per_batch overrides

Validation mirrors Validate() rule-for-rule where the rule still has
meaning here; each error message keeps the reference's wording so a
user migrating a config file sees familiar diagnostics.
"""

from __future__ import annotations

from .config import (
    CacheConfig,
    JobConfig,
    OCRConfig,
    PreprocessingConfig,
)

_ENGINES = ("tesseract", "template")  # template = the deterministic engine
_BIN_MODES = ("otsu", "adaptive")
_SKEW_METHODS = ("hough", "profile", "hough+profile")
_DENOISE_METHODS = ("nlmeans", "median")


class ConfigError(ValueError):
    """Raised on an invalid job config (Validate(), config.go:108-148)."""


def _section(doc: dict, name: str) -> dict:
    sec = doc.get(name) or {}
    if not isinstance(sec, dict):
        raise ConfigError(f"invalid section: {name}")
    return sec


def job_config_from_dict(doc: dict) -> JobConfig:
    ocr_d = _section(doc, "ocr")
    pre_d = _section(doc, "preprocessing")
    perf_d = _section(doc, "performance")
    spark_d = _section(doc, "spark")
    qt = pre_d.get("quality_thresholds") or {}

    engine = ocr_d.get("engine", "tesseract")
    if engine not in _ENGINES:
        raise ConfigError(f"unsupported OCR engine: {engine}")

    base = JobConfig()
    ocr = OCRConfig(
        engine=engine,
        language=str(ocr_d.get("language", base.ocr.language)),
        psm=int(ocr_d.get("page_seg_mode", base.ocr.psm)),
        oem=int(ocr_d.get("engine_mode", base.ocr.oem)),
        char_whitelist=str(ocr_d.get("whitelist", base.ocr.char_whitelist)),
        max_image_size=int(ocr_d.get("max_image_size", base.ocr.max_image_size)),
        timeout_seconds=int(ocr_d.get("timeout", base.ocr.timeout_seconds)),
    )
    if ocr.max_image_size <= 0:
        raise ConfigError(f"invalid max_image_size: {ocr.max_image_size}")
    if ocr.timeout_seconds <= 0:
        raise ConfigError(f"invalid timeout: {ocr.timeout_seconds}")

    pre = PreprocessingConfig(
        enabled=bool(pre_d.get("enabled", base.preprocessing.enabled)),
        auto_mode=bool(pre_d.get("auto_mode", base.preprocessing.auto_mode)),
        grayscale=bool(pre_d.get("grayscale", base.preprocessing.grayscale)),
        denoise=bool(pre_d.get("denoise", base.preprocessing.denoise)),
        binarization_mode=str(
            pre_d.get("binarization_mode", base.preprocessing.binarization_mode)
        ),
        adaptive_block_size=int(
            pre_d.get("adaptive_block_size", base.preprocessing.adaptive_block_size)
        ),
        adaptive_c=float(pre_d.get("adaptive_c", base.preprocessing.adaptive_c)),
        deskew_enabled=bool(
            pre_d.get("deskew_correction", base.preprocessing.deskew_enabled)
        ),
        deskew_angle_limit=float(
            pre_d.get("deskew_angle_limit", base.preprocessing.deskew_angle_limit)
        ),
        skew_method=str(pre_d.get("skew_method", base.preprocessing.skew_method)),
        denoise_method=str(
            pre_d.get("denoise_method", base.preprocessing.denoise_method)
        ),
        sharpness_threshold=float(
            qt.get("sharpness", base.preprocessing.sharpness_threshold)
        ),
        contrast_threshold=float(
            qt.get("contrast", base.preprocessing.contrast_threshold)
        ),
        brightness_min=float(
            qt.get("brightness", base.preprocessing.brightness_min)
        ),
        brightness_max=base.preprocessing.brightness_max,  # analyzer.go:33
    )
    if pre.binarization_mode not in _BIN_MODES:
        raise ConfigError(f"invalid binarization_mode: {pre.binarization_mode}")
    if pre.skew_method not in _SKEW_METHODS:
        raise ConfigError(f"invalid skew_method: {pre.skew_method}")
    if pre.denoise_method not in _DENOISE_METHODS:
        raise ConfigError(f"invalid denoise_method: {pre.denoise_method}")
    if pre.adaptive_block_size % 2 == 0 or pre.adaptive_block_size < 3:
        raise ConfigError(
            f"invalid adaptive_block_size: {pre.adaptive_block_size}"
        )

    cache = CacheConfig(
        enabled=bool(perf_d.get("cache_enabled", base.cache.enabled)),
        ttl_seconds=int(perf_d.get("cache_ttl", base.cache.ttl_seconds)),
        max_entries=int(perf_d.get("cache_size", base.cache.max_entries)),
    )
    if cache.enabled and cache.max_entries <= 0:
        raise ConfigError(f"invalid cache_size: {cache.max_entries}")

    pool = int(perf_d.get("worker_pool_size", base.media_partitions))
    if pool <= 0:
        raise ConfigError(f"invalid worker_pool_size: {pool}")
    queue_size = int(perf_d.get("queue_size", 100))
    if queue_size <= 0:
        raise ConfigError(f"invalid queue_size: {queue_size}")

    job = JobConfig(
        ocr=ocr,
        preprocessing=pre,
        cache=cache,
        media_partitions=int(spark_d.get("media_partitions", pool)),
        arrow_max_records_per_batch=int(
            spark_d.get(
                "arrow_max_records_per_batch", base.arrow_max_records_per_batch
            )
        ),
        checkpoint_buckets=int(
            spark_d.get("checkpoint_buckets", base.checkpoint_buckets)
        ),
    )
    if job.media_partitions <= 0:
        raise ConfigError(f"invalid media_partitions: {job.media_partitions}")
    if job.checkpoint_buckets <= 0:
        raise ConfigError(f"invalid checkpoint_buckets: {job.checkpoint_buckets}")
    return job


def load_job_config(path: str) -> JobConfig:
    """Load + validate a YAML job config file (Load, config.go:81-106)."""
    import yaml

    with open(path) as fh:
        doc = yaml.safe_load(fh) or {}
    if not isinstance(doc, dict):
        raise ConfigError("config root must be a mapping")
    return job_config_from_dict(doc)
