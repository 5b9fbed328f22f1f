r"""TPE-lite sampler (``training/hyperopt.py``): surface compatibility and
the beats-random-search guarantee that justifies replacing the fallback
(reference capability: optuna TPE, ``vp_suite/vpsuite.py:428-457``)."""
import numpy as np

from vp_suite_tpu.training.hyperopt import RandomSearchStudy, TPEStudy


def _quadratic(trial):
    x = trial.suggest_float("x", -5.0, 5.0)
    y = trial.suggest_float("y", 1e-4, 1e2, log=True)
    return (x - 1.7) ** 2 + (np.log10(y) - 0.5) ** 2


def _best_value(study):
    sign = -1.0 if study.direction == "maximize" else 1.0
    return min(sign * v for v, _ in study.trials)


def test_tpe_beats_random_search_on_quadratic():
    n_trials, n_seeds = 40, 10
    tpe_scores, rnd_scores = [], []
    for seed in range(n_seeds):
        tpe = TPEStudy(direction="minimize", seed=seed)
        tpe.optimize(_quadratic, n_trials=n_trials)
        rnd = RandomSearchStudy(direction="minimize", seed=seed)
        rnd.optimize(_quadratic, n_trials=n_trials)
        tpe_scores.append(_best_value(tpe))
        rnd_scores.append(_best_value(rnd))
    assert np.mean(tpe_scores) < np.mean(rnd_scores), \
        (tpe_scores, rnd_scores)


def test_tpe_maximize_direction():
    study = TPEStudy(direction="maximize", seed=0)
    study.optimize(lambda t: -(t.suggest_float("x", -3, 3) - 1.0) ** 2,
                   n_trials=30)
    assert abs(study.best_params["x"] - 1.0) < 0.5


def test_tpe_int_and_categorical():
    def objective(trial):
        n = trial.suggest_int("n", 1, 20)
        c = trial.suggest_categorical("c", ["a", "b", "c"])
        return abs(n - 13) + (0.0 if c == "b" else 5.0)

    study = TPEStudy(direction="minimize", seed=3)
    study.optimize(objective, n_trials=40)
    assert study.best_params["c"] == "b"
    assert isinstance(study.best_params["n"], int)
    assert abs(study.best_params["n"] - 13) <= 3


def test_suggestions_respect_bounds():
    seen = []

    def objective(trial):
        x = trial.suggest_float("x", 0.5, 2.0, log=True)
        n = trial.suggest_int("n", -3, 4)
        seen.append((x, n))
        return x

    study = TPEStudy(direction="minimize", seed=1)
    study.optimize(objective, n_trials=25)
    xs, ns = zip(*seen)
    assert min(xs) >= 0.5 and max(xs) <= 2.0
    assert min(ns) >= -3 and max(ns) <= 4
