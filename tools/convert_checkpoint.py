#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint to an orbax params directory.

    python tools/convert_checkpoint.py CONFIG CKPT.pth OUT_DIR

Handles mmcv meta checkpoints ({'state_dict': ...}), the 'generator.'
prefix, and the unfold-layout permutations (convert/torch_weights.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("out_dir")
    p.add_argument("--validate", action="store_true",
                   help="run a forward pass on random input after loading")
    p.add_argument("--strict", action="store_true",
                   help="fail on unconsumed/unexplained checkpoint keys and "
                        "on any shape mismatch vs the built model")
    p.add_argument("--ema", action="store_true",
                   help="extract the generator_ema copy (RealCiaoSR GAN "
                        "checkpoints; the weights used at inference)")
    args = p.parse_args()

    from ciaosr_tpu.config.config import Config
    from ciaosr_tpu.convert.load import load_torch_checkpoint
    from ciaosr_tpu.train.checkpoint import save_params

    cfg = Config.fromfile(args.config)
    params = load_torch_checkpoint(args.checkpoint, cfg.model,
                                   ema=args.ema, strict=args.strict,
                                   log=print)

    if args.strict:
        # shape audit: converted tree vs the model's own init shapes
        import jax
        import jax.numpy as jnp
        import ciaosr_tpu.models.restorers  # noqa: F401
        import ciaosr_tpu.models.real_restorer  # noqa: F401
        from ciaosr_tpu.convert.audit import (ConversionAuditError,
                                              tree_shape_mismatches)
        from ciaosr_tpu.models.builder import build_model
        model = build_model(cfg.model, test_cfg=cfg.test_cfg)
        expected = jax.eval_shape(
            model.generator.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 32, 2)),
            jnp.full((1, 32, 2), 0.05))
        bad = tree_shape_mismatches(params, expected)
        if bad:
            raise ConversionAuditError(
                "converted params do not match the model:\n  "
                + "\n  ".join(bad))
        print("shape audit OK (tree structure + every leaf shape match)")

    if args.validate:
        import jax.numpy as jnp
        import ciaosr_tpu.models.restorers  # noqa: F401
        import ciaosr_tpu.models.real_restorer  # noqa: F401
        from ciaosr_tpu.models.builder import build_model
        model = build_model(cfg.model, test_cfg=cfg.test_cfg)
        out = model.generator.apply(
            params, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 32, 2)),
            jnp.full((1, 32, 2), 0.05))
        assert out.shape == (1, 32, 3), out.shape
        print("validation forward OK")

    save_params(args.out_dir, params)
    print(f"saved converted params to {args.out_dir}")


if __name__ == "__main__":
    main()
