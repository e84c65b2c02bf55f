import numpy as np, time, sys, subprocess, json, os

def triad(n=40_000_000, reps=5):
    a = np.random.default_rng(0).random(n)
    b = np.random.default_rng(1).random(n)
    c = np.empty_like(a)
    best = 1e9
    for _ in range(reps):
        t = time.perf_counter()
        np.add(b, a, out=c); np.multiply(c, 0.5, out=c)
        best = min(best, time.perf_counter() - t)
    # bytes moved per triad ~ 4 arrays x 8B x n (2 reads + 2 write passes)
    return 4 * 8 * n / best / 1e9

if len(sys.argv) > 1 and sys.argv[1] == "child":
    print(triad())
    sys.exit()

for nproc in (1, 2, 8, 32):
    procs = [subprocess.Popen([sys.executable, __file__, "child"], stdout=subprocess.PIPE,
             env={**os.environ, "OMP_NUM_THREADS": "1"}) for _ in range(nproc)]
    bws = [float(p.communicate()[0]) for p in procs]
    print(json.dumps({"nproc": nproc, "per_proc_GBs": round(sum(bws)/len(bws),2), "aggregate_GBs": round(sum(bws),2)}))
