"""CLI entry (reference: main.py).

    python -m hyperreel_tpu.main [--config cfg.yaml] [key=value ...]
        [--render-only] [--resume PATH]

Overrides use the reference's Hydra-style dotted syntax
(`training.num_epochs=2 dataset.name=llff dataset.root_dir=/data/fern`).
"""

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("--render-only", action="store_true",
                        help="skip training; render spiral from checkpoint")
    parser.add_argument("--resume", default=None,
                        help="checkpoint dir to resume/render from")
    parser.add_argument("overrides", nargs="*",
                        help="dotted config overrides key=value")
    args = parser.parse_args(argv)

    from hyperreel_tpu.config import load_config
    from hyperreel_tpu.system import System

    cfg = load_config(args.config, args.overrides)
    print("config:", cfg)
    system = System(cfg)

    if args.render_only:
        from hyperreel_tpu.train.checkpoint import restore_checkpoint
        assert args.resume, "--render-only requires --resume"
        state = restore_checkpoint(args.resume, system.trainer)
        system.render_spiral(state)
        return

    state, _ = system.fit(resume_from=args.resume)
    metrics = system.validate(state)
    print("final:", metrics)


if __name__ == "__main__":
    main()
