import pytest

from mcp_ocr_server_spark.config import JobConfig, OCRConfig
from mcp_ocr_server_spark.session import get_spark

# Fixture job config: identical semantics to the reference defaults
# (config.go:186-219) except max_image_size scaled down (10 MiB -> 64 KiB)
# so the 'oversize' guard path (handler.go:252-254) is exercised without
# generating multi-MB noise images in every test run.
FIXTURE_JOB = JobConfig(ocr=OCRConfig(max_image_size=64_000))


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[8]", cfg=FIXTURE_JOB)
    yield s
