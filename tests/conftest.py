import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts(tmp_path_factory):
    """Seeded tiny transcripts parquet (multi-fragment) + side dict."""
    from raybeats.fixtures import write_transcripts

    out = tmp_path_factory.mktemp("transcripts_tiny")
    info = write_transcripts(str(out), n_convs=60, seed=7, num_files=4)
    return info


REFERENCE_DISSECT_CORPUS = (
    "/root/reference/libbeat/processors/dissect/testdata/dissect_tests.json"
)


@pytest.fixture(scope="session")
def dissect_corpus():
    import json

    if not os.path.exists(REFERENCE_DISSECT_CORPUS):
        pytest.skip("reference dissect corpus not available")
    with open(REFERENCE_DISSECT_CORPUS) as f:
        return json.load(f)
