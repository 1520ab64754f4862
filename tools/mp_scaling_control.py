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
    path = synth.ensure_corpus(100000)
    n = 100000
    for procs in (1, 8, 32):
        chunks = [(path, i * n // procs, (i + 1) * n // procs) for i in range(procs)]
        t0 = time.time()
        with mp.get_context("fork").Pool(procs) as p:
            res = p.map(work, chunks)
        print(f"procs={procs} wall={time.time()-t0:.1f} rows={sum(res)}", flush=True)
