import time
import multiprocessing as mp
from osm2geojson_ray import synth


def work(args):
    import pyarrow.dataset as pads
    from osm2geojson_ray.sources.documents import extract_elements_batch
    from osm2geojson_ray.stages import parse as P
    path, lo, hi = args
    tab = pads.dataset(path, format="parquet").to_table()
    els = extract_elements_batch(tab.slice(lo, hi - lo))
    return P.parse_nodes_batch(els).num_rows


if __name__ == "__main__":
    # fixed WORK split into many tasks (so every proc count runs the same
    # kernels over the same bytes); tasks = 64 regardless of pool size
    path = synth.ensure_corpus(100000)
    n = 100000
    tasks = 64
    chunks = [(path, i * n // tasks, (i + 1) * n // tasks) for i in range(tasks)]
    for procs in (1, 2, 4, 8, 32):
        best = None
        for _ in range(2):
            t0 = time.time()
            with mp.get_context("fork").Pool(procs) as p:
                res = p.map(work, chunks)
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"procs={procs} wall={best:.1f} rows={sum(res)}", flush=True)
