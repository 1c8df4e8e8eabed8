"""A/B the Pallas encoder front in the full 300s offline pipeline."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jaxcache",
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from spleeterrt_tpu.config import SeparatorConfig
from spleeterrt_tpu.core import model, separate, transform

SECONDS = 300.0
SR = 44100

cfg = SeparatorConfig(
    bin_limit=1536, time_step=256, num_stems=4, compute_dtype=jnp.bfloat16
)
params4 = [model.init_params(jax.random.PRNGKey(i)) for i in range(4)]
stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params4)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((2, int(SECONDS * SR))) * 0.3, jnp.float32)
padded = jax.device_put(transform.pad_offline(audio, cfg.transform))

for force in (False, True):
    model.FORCE_PALLAS_ENCODER = force

    @jax.jit
    def checksum(stacked, padded):
        return jnp.sum(jnp.abs(separate.separate_4stem(stacked, padded, cfg)))

    float(checksum(stacked, padded))
    best = min(
        (lambda t0: (float(checksum(stacked, padded)), time.perf_counter() - t0))(
            time.perf_counter()
        )[1]
        for _ in range(4)
    )
    print(json.dumps({"pallas_encoder": force, "e2e_ms": round(best * 1e3, 1),
                      "rtf": round(SECONDS / best, 1)}))
    model.FORCE_PALLAS_ENCODER = None
