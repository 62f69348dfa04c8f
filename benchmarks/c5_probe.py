import json, time, sys
import jax
import numpy as np

from nestmc.config import KernelConfig, RunConfig, SamplerConfig
from nestmc.engine import sample
from nestmc.models import make_hier_logistic, synth_logistic

full_rhat = "--full-rhat" in sys.argv
warmup = int(sys.argv[sys.argv.index("--warmup") + 1]) if "--warmup" in sys.argv else 100
draws = int(sys.argv[sys.argv.index("--draws") + 1]) if "--draws" in sys.argv else 128
seg = int(sys.argv[sys.argv.index("--segment-size") + 1]) if "--segment-size" in sys.argv else 4096

data, _ = synth_logistic(jax.random.key(5000), G=100_000, n=20, p=3)
model = make_hier_logistic(data, tau_prior="invgamma")
cfg = SamplerConfig(
    kernel=KernelConfig(algorithm="newton", fused_accept=True),
    run=RunConfig(
        chains=512, warmup=warmup, draws=draws, seed=0,
        segment_size=seg,
        collect={"mu": None, "log_tau": None, "beta": 8},
        log_every_segment=True,
        full_rhat=full_rhat, full_rhat_thin=4,
    ),
)
t0 = time.perf_counter()
post = sample(model, data, cfg)
wall = time.perf_counter() - t0
dev = jax.devices()[0]
try:
    ms = dev.memory_stats()
    peak = ms.get("peak_bytes_in_use", 0) / 2**30
    lim = ms.get("bytes_limit", 0) / 2**30
except Exception as e:
    peak = lim = -1
print(json.dumps({
    "full_rhat": full_rhat, "warmup": warmup, "draws": draws,
    "worst_rhat": round(post.worst_rhat(), 4),
    "peak_hbm_gib": round(peak, 2), "hbm_limit_gib": round(lim, 2),
    "timings": {k: round(v, 2) for k, v in post.timings.items()},
    "wall_s": round(wall, 1),
}))
