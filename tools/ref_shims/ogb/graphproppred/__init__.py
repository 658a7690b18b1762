"""ogb.graphproppred shim: the two symbols the reference imports.

`mol_encoder` (AtomEncoder/BondEncoder) lives in its own module; the
`Evaluator` here reimplements the ogb graph-prop evaluator surface the
reference's exp/train_utils.py:206-211 delegates to for ogbg-* metrics
(rocauc / ap over possibly-NaN multitask labels).  sklearn supplies the
metrics, matching ogb's own implementation semantics.
"""
import numpy as np


class Evaluator:
    def __init__(self, name: str):
        self.name = name
        if "molhiv" in name or name == "rocauc":
            self.eval_metric = "rocauc"
        elif "molpcba" in name or name == "ap":
            self.eval_metric = "ap"
        else:
            self.eval_metric = "rocauc"

    def eval(self, input_dict):
        from sklearn import metrics as met

        y_true = np.asarray(input_dict["y_true"], dtype=np.float64)
        y_pred = np.asarray(input_dict["y_pred"], dtype=np.float64)
        if y_true.ndim == 1:
            y_true = y_true[:, None]
            y_pred = y_pred[:, None]
        vals = []
        for t in range(y_true.shape[1]):
            valid = ~np.isnan(y_true[:, t])
            yt, yp = y_true[valid, t], y_pred[valid, t]
            if len(np.unique(yt)) < 2:
                continue
            if self.eval_metric == "rocauc":
                vals.append(met.roc_auc_score(yt, yp))
            else:
                vals.append(met.average_precision_score(yt, yp))
        return {self.eval_metric: float(np.mean(vals)) if vals else np.nan}
