import dataclasses, jax, jax.numpy as jnp, numpy as np
from speech_enhancement_clskd_tpu.config import *
from speech_enhancement_clskd_tpu.train import Trainer
from speech_enhancement_clskd_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
cfg = TrainConfig(
    teacher=dataclasses.replace(TEACHER, compute_dtype="bfloat16"),
    student=dataclasses.replace(STUDENT, compute_dtype="bfloat16"),
    data=DataConfig(synthetic=True, batch_size=32, segment=3.0),
    distill=DistillConfig(strategy="clskd", taps_dtype="bfloat16"),
    mesh=MeshConfig(data=-1, model=1))
tr = Trainer(cfg); s = tr.init_state()
rng = np.random.default_rng(0)
mx = jnp.asarray(rng.standard_normal((32,48000)).astype(np.float32)*0.1)
cl = jnp.asarray(rng.standard_normal((32,48000)).astype(np.float32)*0.1)
s, logs = tr.train_step(s, mx, cl)
print({k: round(float(v),5) for k,v in logs.items()}, flush=True)
