"""Checkpoint/resume + lineage metrics (SURVEY.md §4)."""

import shutil

import pytest

from osm2geojson_ray.state.checkpoints import run_checkpointed_flagship


@pytest.fixture()
def workdir(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_checkpoint_run_and_resume(small_corpus_dir, workdir):
    out1 = run_checkpointed_flagship(small_corpus_dir, workdir, num_parts=8)
    cp1 = out1["pipeline"]
    n_features = out1["features"].count()
    assert n_features > 0
    assert "complete_ways" in cp1.executed and not cp1.skipped

    # resumed run: every stage skipped, same results
    out2 = run_checkpointed_flagship(small_corpus_dir, workdir, num_parts=8)
    cp2 = out2["pipeline"]
    assert not cp2.executed
    assert set(cp2.skipped) >= {"elements", "nodes", "ways", "relations",
                                "complete_ways", "complete_relations", "features"}
    assert out2["features"].count() == n_features

    # partial resume: invalidate one stage → only it (and nothing upstream) reruns
    import os

    os.remove(os.path.join(workdir, "features", "_MANIFEST.json"))
    out3 = run_checkpointed_flagship(small_corpus_dir, workdir, num_parts=8)
    assert out3["pipeline"].executed == ["features"]
    assert out3["features"].count() == n_features

    # crash-mid-write: a stage dir WITHOUT a manifest (killed before the
    # manifest landed) plus leftover partial/garbage files must be wiped
    # and fully re-run, not trusted
    os.remove(os.path.join(workdir, "features", "_MANIFEST.json"))
    with open(os.path.join(workdir, "features", "part-garbage.parquet"), "w") as f:
        f.write("not parquet")
    out4 = run_checkpointed_flagship(small_corpus_dir, workdir, num_parts=8)
    assert out4["pipeline"].executed == ["features"]
    assert out4["features"].count() == n_features
    assert not os.path.exists(os.path.join(workdir, "features", "part-garbage.parquet"))

    # lineage metrics recorded per stage execution
    lineage = out4["pipeline"].lineage()
    stages = {r["stage"] for r in lineage}
    assert "complete_relations" in stages
    first_run = [r for r in lineage if not r["resumed"] and r["stage"] == "features"]
    assert first_run and first_run[0]["rows"] == n_features
