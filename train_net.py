#!/usr/bin/env python
"""CLI entry point mirroring the reference's ``train_net.py`` semantics:

    python train_net.py --config configs/seg_res50fpn_source.yaml [opts ...]
    python train_net.py --eval-only --config configs/test_segment.yaml \
        MODEL.WEIGHTS <ckpt> [opts ...]

(reference ``train_net.py:22-101``: setup -> trainer dispatch by
``SEMISUPNET.Trainer`` -> train or eval-only TTA; results append to
``OUTPUT_DIR/result_ap.txt``).  Multi-device runs need no ``launch``: the
jitted steps are mesh-polymorphic over all visible TPU chips.
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", "--config", dest="config_file", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--datasets-root", default=None,
                   help="root of the Fundus/Polyp dataset tree (or TTDG_DATASETS)")
    # multi-host flags mirroring the reference's launch() args
    # (reference train_net.py:94-101 / d2 default_argument_parser): one
    # process per HOST here, rendezvous via jax.distributed
    p.add_argument("--num-machines", type=int, default=1)
    p.add_argument("--machine-rank", type=int, default=0)
    p.add_argument("--dist-url", default=None,
                   help="coordinator tcp://host:port (default: TPU pod "
                        "auto-discovery)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")

    # Honor JAX_PLATFORMS even when a site hook pinned jax_platforms at
    # interpreter start (the axon hook sets "axon,cpu", which would make a
    # CPU-only CI subprocess block on — or steal — the TPU tunnel).
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if args.num_machines > 1 or args.dist_url:
        from ttdg_mgm_tpu.parallel.multihost import initialize_multihost

        initialize_multihost(args.dist_url, args.num_machines,
                             args.machine_rank)

    from ttdg_mgm_tpu.config import setup_cfg
    from ttdg_mgm_tpu.data.builtin import register_all_medical
    from ttdg_mgm_tpu.build import build_trainer

    cfg = setup_cfg(args.config_file, args.opts)
    register_all_medical(args.datasets_root or cfg.DATASETS.ROOT)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)

    trainer = build_trainer(cfg)

    import jax

    if args.eval_only:
        results = trainer.test(
            cfg.DATASETS.TEST,
            ttt=cfg.TEST.TTT,
            tta_batch=cfg.TEST.BATCH,
            min_batch_num=cfg.TEST.MIN_BATCH_NUM,
            dice_threshold=cfg.TEST.DICE_THRES,
            # TEST.EVALUATOR (a reference key that is dead in the snapshot):
            # "coco"/"dice"/"pascal_voc" forces that evaluator; the reference
            # default "COCOeval" keeps per-dataset metadata dispatch
            evaluator_type=(cfg.TEST.EVALUATOR
                            if cfg.TEST.EVALUATOR in
                            ("coco", "dice", "pascal_voc", "pascal_voc_water")
                            else None),
            # visualization PNGs land on the shared OUTPUT_DIR — rank 0 only,
            # or multi-host runs write torn/clobbered files (same gating as
            # result_ap.txt below; reference comm.is_main_process)
            draw_dir=(cfg.OUTPUT_DIR
                      if cfg.TEST.DRAW and jax.process_index() == 0 else None),
        )
        # shared-filesystem writes on the main process only (reference gates
        # via comm.is_main_process; OUTPUT_DIR is shared across hosts)

        if jax.process_index() == 0:
            out_path = os.path.join(cfg.OUTPUT_DIR, "result_ap.txt")
            with open(out_path, "a") as f:
                f.write(json.dumps({"weights": cfg.MODEL.WEIGHTS,
                                    "results": results}) + "\n")
            print(json.dumps(results, indent=2))
        return results

    from ttdg_mgm_tpu.checkpoint.save import Checkpointer

    ckpt = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
    # the reference CLI forces resume (train_net.py:92 sets args.resume=True):
    # restore the full train state from the latest checkpoint when present
    trainer.resume_or_load(ckpt)
    hooks = trainer.default_hooks(
        checkpointer=ckpt,
        checkpoint_period=cfg.SOLVER.CHECKPOINT_PERIOD,
        output_dir=cfg.OUTPUT_DIR,
    )
    if cfg.TEST.EVAL_PERIOD > 0 and cfg.DATASETS.TEST:
        from ttdg_mgm_tpu.engine.hooks import LossEvalHook

        hooks.append(LossEvalHook(trainer, cfg.DATASETS.TEST[0],
                                  cfg.TEST.EVAL_PERIOD))
    trainer.train(
        cfg.DATASETS.TRAIN,
        max_iter=cfg.SOLVER.MAX_ITER,
        batch_size=cfg.SOLVER.IMS_PER_BATCH,
        seed=cfg.SEED,
        hooks=hooks,
    )
    ckpt.save(int(trainer.state.step), trainer.state_dict(), wait=True)


if __name__ == "__main__":
    main()
