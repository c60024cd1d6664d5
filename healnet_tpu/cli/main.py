"""Training CLI: single runs, sweeps, run plans, regularisation ablations.

Mirrors the reference entry point (`/root/reference/healnet/main.py:632-725`):

    python -m healnet_tpu.cli.main --config_path config/main.yml \
        --mode {single_run,sweep,run_plan,reg_ablation} [--dataset brca]

- ``single_run``: one Pipeline.main() over n_folds;
- ``sweep``: local sweep engine over a wandb-schema YAML
  (:mod:`healnet_tpu.train.sweep`), objective = the sweep metric from the
  fold aggregate;
- ``run_plan``: grid over datasets x sources x models with 5 folds,
  exceptions logged and skipped (`main.py:656-693`);
- ``reg_ablation``: grid over l1 x snn x datasets (`main.py:695-717`).
"""

from __future__ import annotations

import argparse
import itertools
import traceback
from typing import Any, Dict

import yaml

from healnet_tpu.train.pipeline import Pipeline
from healnet_tpu.train.sweep import Sweep
from healnet_tpu.utils import Box, Config


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run the healnet_tpu training pipeline"
    )
    parser.add_argument("--config_path", type=str, default="config/main.yml")
    parser.add_argument(
        "--mode",
        type=str,
        default="single_run",
        choices=["single_run", "sweep", "run_plan", "reg_ablation"],
    )
    parser.add_argument(
        "--sweep_config", type=str, default="config/sweep_bayesian.yaml"
    )
    parser.add_argument("--sweep_trials", type=int, default=20)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument(
        "--datasets", nargs="+", default=["blca", "brca", "ucec", "kirp"]
    )
    return parser


def load_config(args) -> Box:
    config = Config(args.config_path).read()
    if args.dataset is not None:
        config["dataset"] = args.dataset
    all_hyperparams = Config(config["hyperparams"]).read()
    if config["dataset"] not in all_hyperparams:
        raise SystemExit(
            f"error: no hyperparameters for dataset '{config['dataset']}' in "
            f"{config['hyperparams']}; available: {sorted(all_hyperparams)}"
        )
    config["model_params"] = all_hyperparams[config["dataset"]]
    return config


def run_single(config: Box, args) -> Dict[str, Any]:
    return Pipeline(config=config, args=args).main()


def run_sweep(config: Box, args) -> Dict[str, Any]:
    with open(args.sweep_config) as f:
        spec = yaml.safe_load(f)
    sweep = Sweep(spec)

    base_name = config.get("run_name")
    trial_no = itertools.count(1)

    def objective(params: Dict[str, Any]) -> Dict[str, Any]:
        # per-trial run name: a shared run_name would interleave
        # metrics.jsonl across trials, overwrite summaries, and — with
        # train_loop.checkpoint+resume on — make trial N+1 restore trial
        # N's weights from the colliding per-fold checkpoint dir
        i = next(trial_no)
        name = f"{base_name}_trial{i}" if base_name else None
        pipeline = Pipeline(config=config, args=args, wandb_name=name)
        return pipeline.main(sweep_overrides=params)

    from pathlib import Path

    csv_path = Path(config.get("log_path", "logs")) / "sweep_results.csv"
    best = sweep.run(objective, n_trials=args.sweep_trials, csv_path=str(csv_path))
    print(f"Best trial: {best['params']} -> {best['metrics']}")
    return best


def run_plan(config: Box, args) -> None:
    datasets = [args.dataset] if args.dataset else args.datasets
    grid = list(
        itertools.product(datasets, [["omic", "slides"]], ["healnet"])
    )
    for iteration, (dataset, sources, model) in enumerate(grid):
        print(f"Run plan iteration {iteration + 1}/{len(grid)}")
        print(f"Dataset: {dataset}, Sources: {sources}, Model: {model}")
        config["dataset"] = dataset
        config["sources"] = sources
        config["model"] = model
        config["n_folds"] = 5
        try:
            # inside the try: a dataset missing from the hyperparams file
            # must be logged and skipped like any other per-run failure
            # (`main.py:688-690`), not abort the remaining plan
            config["model_params"] = Config(config["hyperparams"]).read()[dataset]
            Pipeline(config=config, args=args).main()
        except Exception as exc:
            print(f"Exception: {exc}")
            traceback.print_exc()
            continue
    print(f"Successfully finished runplan: {grid}")


def run_reg_ablation(config: Box, args) -> None:
    config["sources"] = ["omic", "slides"]
    config["model"] = "healnet"
    config["n_folds"] = 1
    config["train_loop"]["early_stopping"] = False
    config["train_loop"]["epochs"] = 50
    regs = [2.0, 1.0]
    snn_opts = [True, False]
    for dataset in [args.dataset] if args.dataset else args.datasets:
        config["dataset"] = dataset
        hyperparams = Config(config["hyperparams"]).read()[dataset]
        config["model_params"] = hyperparams
        best_reg = float(config["model_params"]["l1"])
        for reg in regs:
            for snn in snn_opts:
                config["model_params"]["l1"] = best_reg / reg
                config["model_params"]["snn"] = snn
                Pipeline(config=config, args=args).main()


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    config = load_config(args)
    if args.mode == "run_plan":
        run_plan(config, args)
    elif args.mode == "reg_ablation":
        run_reg_ablation(config, args)
    elif args.mode == "sweep":
        run_sweep(config, args)
    else:
        run_single(config, args)


if __name__ == "__main__":
    main()
