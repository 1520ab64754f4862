import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus_dir():
    from osm2geojson_ray import synth

    return synth.ensure_corpus(120)


@pytest.fixture(scope="session")
def small_world(small_corpus_dir):
    """Parsed tables of the 120-doc corpus, computed once, kernel-level
    (no Ray) — the hand-checkable ground truth for stage tests."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    from osm2geojson_ray.sources.documents import extract_elements_batch
    from osm2geojson_ray.stages import parse
    import pyarrow.dataset as pads

    tab = pads.dataset(small_corpus_dir, format="parquet").to_table()
    els = extract_elements_batch(tab)
    return {
        "documents": tab,
        "elements": els,
        "nodes": parse.parse_nodes_batch(els),
        "ways": parse.parse_ways_batch(els),
        "relations": parse.parse_relations_batch(els),
        "rejects": parse.rejects_batch(els),
    }
