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
    parser.add_argument("--eval-only", action="store_true",
                        help="skip training; run full validation (all val "
                             "images, saved PNGs + metrics) from checkpoint")
    parser.add_argument("--resume", default=None,
                        help="checkpoint dir to resume/render from")
    parser.add_argument("--import-reference", default=None, metavar="CKPT",
                        help="initialize weights from a reference "
                             "(facebookresearch/hyperreel) .ckpt file")
    parser.add_argument("--export-mesh", default=None, metavar="PLY",
                        help="with --resume: extract the density-field "
                             "isosurface mesh to a PLY file "
                             "(reference utils/tensorf_utils.py:170-229)")
    parser.add_argument("--interact", action="store_true",
                        help="serve the interactive browser viewer from a "
                             "checkpoint (the reference's interact_only "
                             "NeRFGUI mode, utils/gui_utils.py:74)")
    parser.add_argument("--fast-samples", type=int, default=-1,
                        metavar="K",
                        help="viewer fast mode: render with K samples/ray "
                             "— post-sort first-K compaction when the "
                             "model trained with intersect "
                             "invalid_sort_far, else the reference's "
                             "every-(S/K)-th stride knob (fine-tune at K "
                             "recommended for stride; PERFORMANCE.md "
                             "Pareto ladder). Default -1 = auto: compact "
                             "K=16 when the model is compact-eligible "
                             "(measured -0.18 dB for 1.6x throughput), "
                             "full samples otherwise; 0 = always full")
    parser.add_argument("--coherent-gather", action="store_true",
                        help="viewer: patch-row gather (one row per "
                             "4-ray block, ops/patch_gather.py), "
                             "auto-gated per dynamic-ladder level by an "
                             "analytic coverage bound — high-density "
                             "levels take the patch path, low levels "
                             "keep the exact quad path")
    parser.add_argument("overrides", nargs="*",
                        help="dotted config overrides key=value")
    args = parser.parse_args(argv)

    from hyperreel_tpu.config import load_config
    from hyperreel_tpu.system import System

    cfg = load_config(args.config, args.overrides)
    print("config:", cfg)
    system = System(cfg)

    if args.import_reference:
        import jax
        from hyperreel_tpu.tools.import_reference_ckpt import (
            import_reference_checkpoint)
        state = system.trainer.init_state(
            jax.random.PRNGKey(cfg["params"].get("seed", 0)))
        params, report = import_reference_checkpoint(
            args.import_reference, system.model, state.params)
        print(f"imported {len(report['mapped'])} tensors, "
              f"skipped {len(report['skipped'])}")
        for src, dst, why in report["skipped"][:20]:
            print(f"  skipped {src} -> {dst}: {why}")
        state = state.__class__(params=params,
                                opt_state=state.opt_state, it=state.it)
        if args.render_only:
            system.render_spiral(state)
            return
        metrics = system.validate(state)
        print("imported-weights validation:", metrics)
        return

    if args.interact:
        import jax
        from hyperreel_tpu.train.checkpoint import restore_checkpoint
        from hyperreel_tpu.viewer import serve
        if args.resume:
            state = restore_checkpoint(args.resume, system.trainer)
        else:
            state = system.trainer.init_state(
                jax.random.PRNGKey(cfg["params"].get("seed", 0)))
        model, params = system.model, state.params
        k = args.fast_samples
        if k:
            from hyperreel_tpu.config import resolve_model_cfg
            from hyperreel_tpu.configs.presets import (
                with_compact_samples, with_inference_samples)
            from hyperreel_tpu.models.model import build_model
            mcfg = resolve_model_cfg(cfg, system.iters_per_epoch)
            far = any(
                st.get("type") == "ray_intersect"
                and st.get("intersect", {}).get("invalid_sort_far")
                for st in mcfg["embedding"]["embeddings"].values())
            auto = k == -1
            if auto:
                # auto: compact K=16 only after a scene-dependent
                # quality probe — the blob ladder measured -0.18 dB but
                # the hostile-occluder scene COLLAPSES (25.0 -> 9.7 dB,
                # round-4 hostile ladder), so auto must verify on the
                # actual checkpoint; stride needs a fine-tune, so auto
                # keeps full samples on non-compactable models
                k = 16 if far else 0
        if k > 0:
            helper = with_compact_samples if far else \
                with_inference_samples
            fast_cfg = helper(mcfg, k)
            fast_model = build_model(
                fast_cfg, dataset_info=system.train_dataset.info())
            init_p = fast_model.init(jax.random.PRNGKey(0))
            emb = dict(init_p["embedding"])
            emb.update(params["embedding"])
            fast_params = dict(params, embedding=emb)
            probe_ok = True
            if auto:
                from hyperreel_tpu.viewer import fast_mode_probe
                probe_ok, d = fast_mode_probe(
                    model, params, fast_model, fast_params,
                    system.train_dataset.all_coords, it=state.it)
                print(f"viewer fast-mode probe: compact-vs-full "
                      f"{d:.1f} dB ({'pass' if probe_ok else 'FAIL'}"
                      f" @ 35.0 gate)")
            if probe_ok:
                mcfg, model, params = fast_cfg, fast_model, fast_params
                print(f"viewer fast mode: {k} samples/ray "
                      f"({'compact' if far else 'stride'})")
            else:
                k = 0
                print("viewer fast mode disabled by quality gate "
                      "(scene-dependent compact loss; use "
                      "--fast-samples to force)")
        patch_model = None
        if args.coherent_gather:
            from hyperreel_tpu.config import resolve_model_cfg
            from hyperreel_tpu.configs.presets import with_coherent_gather
            from hyperreel_tpu.models.model import build_model
            if k <= 0:
                mcfg = resolve_model_cfg(cfg, system.iters_per_epoch)
            patch_model = build_model(
                with_coherent_gather(mcfg),
                dataset_info=system.train_dataset.info())
            print("viewer coherent patch-gather on (auto-gated per "
                  "ladder level by the coverage bound)")
        ray_width = system.train_dataset.all_coords.shape[-1]
        serve(model, params, ray_width=ray_width,
              patch_model=patch_model)
        return

    if args.render_only or args.eval_only or args.export_mesh:
        from hyperreel_tpu.train.checkpoint import restore_checkpoint
        assert args.resume, \
            "--render-only/--eval-only/--export-mesh require --resume"
        state = restore_checkpoint(args.resume, system.trainer)
        if args.export_mesh:
            from hyperreel_tpu.train.export import export_mesh_ply
            nv, nf = export_mesh_ply(args.export_mesh,
                                     system.model.color_net,
                                     state.params["color"])
            print(f"mesh: {nv} verts, {nf} faces -> {args.export_mesh}")
        if args.eval_only:
            metrics = system.validate(state, save_images=True)
            print("eval:", metrics)
        if args.render_only:
            system.render_spiral(state)
        return

    state, _ = system.fit(resume_from=args.resume)
    metrics = system.validate(state)
    print("final:", metrics)


if __name__ == "__main__":
    main()
