import multiprocessing as mp, time, numpy as np, json

def bw_worker(q, secs, barrier):
    a = np.ones(16_000_000)   # 128 MB
    b = np.empty_like(a); np.copyto(b, a)  # warm pages BEFORE timing
    barrier.wait()
    t0 = time.monotonic(); n = 0
    while time.monotonic() - t0 < secs:
        np.copyto(b, a); n += 1
    q.put(n * a.nbytes * 2 / (time.monotonic() - t0))

def run(nproc, secs=5):
    q = mp.Queue(); barrier = mp.Barrier(nproc)
    ps = [mp.Process(target=bw_worker, args=(q, secs, barrier)) for _ in range(nproc)]
    [p.start() for p in ps]; [p.join() for p in ps]
    return sum(q.get() for _ in ps)

if __name__ == "__main__":
    r = {n: run(n) for n in (1, 8, 32)}
    print(json.dumps({
        "agg_GBps": {k: round(v/1e9,1) for k,v in r.items()},
        "eff_8": round(r[8]/(r[1]*8),3), "eff_32": round(r[32]/(r[1]*32),3),
        "per_proc_8v32": round((r[32]/32)/(r[8]/8),3)}))
