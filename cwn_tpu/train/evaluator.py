"""Metrics.

Parity: /root/reference/exp/train_utils.py:147-211 (Evaluator): isomorphism
(pairwise-distance failure rate), accuracy, average precision, MAE, and the
OGB molecule metrics (we implement rocauc/ap/rmse/acc natively; no ogb
package dependency needed at eval time).
"""
from __future__ import annotations

import numpy as np
from sklearn import metrics as met


class Evaluator:
    def __init__(self, metric: str, eps: float = 0.01, p_norm: int = 2):
        self.metric = metric
        self.eps = eps
        self.p_norm = p_norm
        if metric == "isomorphism":
            self.eval_fn = self._isomorphism
        elif metric == "accuracy":
            self.eval_fn = self._accuracy
        elif metric == "ap":
            self.eval_fn = self._ap
        elif metric == "mae":
            self.eval_fn = self._mae
        elif metric.startswith("ogbg-mol"):
            # All ogbg-mol* classification datasets use rocauc except
            # molpcba (ap); regression ones use rmse.
            if metric in ("ogbg-molpcba", "ogbg-molmuv"):
                self.eval_fn = self._ap_multitask
            elif metric in ("ogbg-mollipo", "ogbg-molesol", "ogbg-molfreesolv"):
                self.eval_fn = self._rmse
            else:
                self.eval_fn = self._rocauc
        else:
            raise NotImplementedError(f"Metric {metric} is not yet supported.")

    def eval(self, input_dict) -> float:
        return self.eval_fn(input_dict)

    def _isomorphism(self, input_dict):
        """Failure rate: fraction of embedding pairs closer than eps."""
        preds = np.asarray(input_dict["y_pred"])
        assert preds.dtype == np.float64
        diffs = preds[:, None, :] - preds[None, :, :]
        dists = np.linalg.norm(diffs, ord=self.p_norm, axis=-1)
        iu = np.triu_indices(len(preds), k=1)
        mm = dists[iu]
        wrong = (mm < self.eps).sum()
        return float(wrong) / mm.shape[0]

    def _accuracy(self, input_dict):
        y_true = np.asarray(input_dict["y_true"]).reshape(-1)
        y_pred = np.argmax(np.asarray(input_dict["y_pred"]), axis=1)
        return float(met.accuracy_score(y_true, y_pred))

    def _ap(self, input_dict):
        return float(met.average_precision_score(
            np.asarray(input_dict["y_true"]), np.asarray(input_dict["y_pred"])))

    def _ap_multitask(self, input_dict):
        """Mean AP over tasks with at least one positive and one negative,
        NaN targets ignored (OGB molpcba protocol)."""
        y_true = np.asarray(input_dict["y_true"], dtype=np.float64)
        y_pred = np.asarray(input_dict["y_pred"], dtype=np.float64)
        if y_true.ndim == 1:
            y_true, y_pred = y_true[:, None], y_pred[:, None]
        aps = []
        for t in range(y_true.shape[1]):
            valid = ~np.isnan(y_true[:, t])
            yt, yp = y_true[valid, t], y_pred[valid, t]
            if len(np.unique(yt)) < 2:
                continue
            aps.append(met.average_precision_score(yt, yp))
        return float(np.mean(aps)) if aps else 0.0

    def _mae(self, input_dict):
        return float(met.mean_absolute_error(
            np.asarray(input_dict["y_true"]), np.asarray(input_dict["y_pred"])))

    def _rmse(self, input_dict):
        y_true = np.asarray(input_dict["y_true"], dtype=np.float64)
        y_pred = np.asarray(input_dict["y_pred"], dtype=np.float64)
        rmses = []
        if y_true.ndim == 1:
            y_true, y_pred = y_true[:, None], y_pred[:, None]
        for t in range(y_true.shape[1]):
            valid = ~np.isnan(y_true[:, t])
            rmses.append(np.sqrt(np.mean((y_true[valid, t] - y_pred[valid, t]) ** 2)))
        return float(np.mean(rmses))

    def _rocauc(self, input_dict):
        """Mean ROC-AUC over valid tasks, NaN targets ignored (OGB protocol)."""
        y_true = np.asarray(input_dict["y_true"], dtype=np.float64)
        y_pred = np.asarray(input_dict["y_pred"], dtype=np.float64)
        if y_true.ndim == 1:
            y_true, y_pred = y_true[:, None], y_pred[:, None]
        aucs = []
        for t in range(y_true.shape[1]):
            valid = ~np.isnan(y_true[:, t])
            yt, yp = y_true[valid, t], y_pred[valid, t]
            if len(np.unique(yt)) < 2:
                continue
            aucs.append(met.roc_auc_score(yt, yp))
        return float(np.mean(aucs)) if aucs else 0.0
