"""Finetune the speech LM (parity with reference examples/finetune.py:103-169,
re-built on the sharded JAX trainer).

Config YAML mirrors the reference's examples/finetune_config.yaml fields.
Dataset: either an HF dataset id with {"text", "codes"} columns (the
emilia-yodas-neucodec layout the reference uses, reference :131-137 — needs
local cache in this offline environment) or --synthetic for generated data.

    python examples/finetune.py examples/finetune_config.yaml
"""

import sys
import time
from pathlib import Path


def load_config(path):
    import yaml

    return yaml.safe_load(Path(path).read_text())


def synthetic_records(n, codebook, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    words = ["hello", "world", "voice", "model", "speech", "sound", "clone"]
    for _ in range(n):
        k = rng.integers(3, 8)
        text = " ".join(rng.choice(words, size=k)) + "."
        codes = rng.integers(0, codebook, size=int(k) * 12).tolist()
        yield {"text": text.capitalize(), "codes": codes}


def main(config_path, synthetic=False):
    cfg_file = load_config(config_path)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neutts_tpu import config as cfglib
    from neutts_tpu.models import backbone as bb
    from neutts_tpu.models import checkpoint as ckpt
    from neutts_tpu.parallel import mesh as meshlib
    from neutts_tpu.text.g2p import get_g2p
    from neutts_tpu.text.tokenizer import ByteTokenizer
    from neutts_tpu.train import data as data_lib
    from neutts_tpu.train import trainer

    model_name = cfg_file.get("model", "tiny" if synthetic else "air")
    cfg = cfglib.BY_NAME[model_name]
    tc = trainer.TrainConfig(
        learning_rate=float(cfg_file.get("learning_rate", 4e-5)),
        warmup_ratio=float(cfg_file.get("warmup_ratio", 0.05)),
        max_steps=int(cfg_file.get("max_steps", 1000)),
        seed=int(cfg_file.get("seed", 1337)),
    )
    max_seq_len = int(cfg_file.get("max_seq_len", cfg.max_context))
    batch_size = int(cfg_file.get("batch_size", 8))

    restore = cfg_file.get("restore_from")
    if restore and Path(restore).exists():
        cfg, params, _, _ = ckpt.load_pipeline(restore)
        print(f"restored backbone from {restore}")
    else:
        params = bb.init_params(cfg, jax.random.PRNGKey(tc.seed))
        print(f"initialized {cfg.name} from scratch")

    tokenizer = ByteTokenizer(cfg.layout)
    g2p = get_g2p()

    if synthetic or cfg_file.get("dataset") in (None, "synthetic"):
        records = list(
            synthetic_records(
                int(cfg_file.get("n_samples", 256)), cfg.layout.codebook_size, tc.seed
            )
        )
    else:
        from datasets import load_dataset

        ds = load_dataset(cfg_file["dataset"], split=cfg_file.get("split", "train"))
        records = ({"text": r["text"], "codes": list(r["codes"])} for r in ds)

    mesh = meshlib.make_mesh()
    params = meshlib.shard_params(params, mesh, cfg)
    opt_state = trainer.make_optimizer(tc).init(params)
    state = trainer.TrainState(params, opt_state, jnp.zeros((), jnp.int32))
    step_fn = trainer.make_sharded_train_step(cfg, tc, mesh)
    data_sh = meshlib.batch_sharding(mesh)

    logging_steps = int(cfg_file.get("logging_steps", 10))
    save_dir = cfg_file.get("checkpoints_dir", "checkpoints")
    step = 0
    t0 = time.time()
    while step < tc.max_steps:
        for batch in data_lib.batches(records, tokenizer, g2p, batch_size, max_seq_len):
            state, metrics = step_fn(
                state,
                jax.device_put(jnp.asarray(batch["tokens"]), data_sh),
                jax.device_put(jnp.asarray(batch["labels"]), data_sh),
                jax.device_put(jnp.asarray(batch["attn_mask"]), data_sh),
            )
            step += 1
            if step % logging_steps == 0:
                print(
                    f"step {step}: loss {float(metrics['loss']):.4f} "
                    f"acc {float(metrics['accuracy']):.3f} "
                    f"({step/(time.time()-t0):.2f} steps/s)"
                )
            if step >= tc.max_steps:
                break
        if not isinstance(records, list):
            break  # single pass over a streamed dataset

    out = Path(save_dir) / "final"
    ckpt.save_params(out / "backbone.npz", jax.device_get(state.params))
    print(f"saved weights to {out}/backbone.npz")


if __name__ == "__main__":
    synthetic = "--synthetic" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0] if args else "examples/finetune_config.yaml", synthetic=synthetic)
