"""sklearn-style estimator layer — parity with xgboost_ray/sklearn.py.

``SparkXGBClassifier`` / ``SparkXGBRegressor`` / RF variants / ``Ranker``
mirror the reference classes (sklearn.py:451, :644, :602, :880, :921) with
the fit/predict/predict_proba surface, but take and return DataFrames — the
``pyspark.ml`` convention. Internally they delegate to the functional
:func:`xgboost_ray_spark.ml.train.train` (which picks the xgboost-barrier
or MLlib backend).

Semantics kept from the reference:
  - classifier ``predict`` = argmax over class scores (sklearn.py:825-835) —
    MLlib's transform does the argmax natively;
  - ``predict_proba`` returns per-class probabilities (sklearn.py:851-865) —
    here an array column;
  - RF variants = many parallel trees, one boosting round
    (sklearn.py:631-637, :908-914) — mapped to MLlib RandomForest;
  - Ranker requires qid (sklearn.py:950-957) — enforced at fit.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from xgboost_ray_spark.matrix import MatrixSpec
from xgboost_ray_spark.ml.params import GBTParams
from xgboost_ray_spark.ml.train import (
    TrainResult,
    predict as _predict,
    predict_proba as _predict_proba,
    train as _train,
)


class _BaseEstimator:
    _objective = "reg:squarederror"
    _is_rf = False

    def __init__(
        self,
        *,
        n_estimators: int = 50,
        max_depth: int = 6,
        learning_rate: float = 0.3,
        subsample: float = 1.0,
        gbt_params: GBTParams | None = None,
        **extra_params: Any,
    ):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.subsample = subsample
        self.gbt_params = gbt_params or GBTParams()
        self.extra_params = extra_params
        self._result: TrainResult | None = None
        self._spec: MatrixSpec | None = None

    # -- sklearn-ish surface ------------------------------------------------
    def get_params(self) -> dict:
        return {
            "n_estimators": self.n_estimators,
            "max_depth": self.max_depth,
            "learning_rate": self.learning_rate,
            "subsample": self.subsample,
            **self.extra_params,
        }

    def _xgb_params(self) -> dict:
        return {
            "objective": self._objective,
            "max_depth": self.max_depth,
            "eta": self.learning_rate,
            "subsample": self.subsample,
            **self.extra_params,
        }

    def fit(
        self,
        df: DataFrame,
        label_col: str,
        *,
        feature_cols: list[str] | None = None,
        weight_col: str | None = None,
        qid_col: str | None = None,
        evals: list[tuple[DataFrame, str]] | None = None,
    ) -> "_BaseEstimator":
        self._spec = MatrixSpec(
            label_cols=(label_col,),
            feature_cols=tuple(feature_cols) if feature_cols else None,
            weight_col=weight_col,
            qid_col=qid_col,
        )
        num_round = 1 if self._is_rf else self.n_estimators
        self._result = _train(
            self._xgb_params(),
            df,
            self._spec,
            num_boost_round=num_round,
            evals=evals,
            gbt_params=self.gbt_params,
        )
        return self

    @property
    def model_(self):
        if self._result is None:
            raise RuntimeError("estimator is not fitted")
        return self._result.model

    @property
    def evals_result_(self) -> dict:
        if self._result is None:
            raise RuntimeError("estimator is not fitted")
        return self._result.evals_result

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        if self._result is None:
            raise RuntimeError("estimator is not fitted")
        return _predict(self._result, df, self._spec, output_col=output_col)


class SparkXGBRegressor(_BaseEstimator):
    """Parity: RayXGBRegressor (sklearn.py:451)."""

    _objective = "reg:squarederror"


class SparkXGBClassifier(_BaseEstimator):
    """Parity: RayXGBClassifier (sklearn.py:644)."""

    _objective = "binary:logistic"

    def fit(self, df: DataFrame, label_col: str, **kw) -> "SparkXGBClassifier":
        # n_classes_ detection (sklearn.py:704-719): switch to the
        # multi-class objective when the label has >2 distinct values.
        # Re-derived on EVERY fit (sklearn refit semantics): a previous
        # multi-class fit must not leak multi:softprob into a later
        # binary fit of the same instance. NULL is not a class — counting
        # it would flip a {0,1,NULL} binary problem to multi:softprob
        # with a phantom third class.
        from pyspark.sql import functions as F

        n_classes = (
            df.filter(F.col(label_col).isNotNull())
            .select(label_col)
            .distinct()
            .count()
        )
        self.n_classes_ = n_classes
        self._objective = (
            "multi:softprob" if n_classes > 2 else type(self)._objective
        )
        return super().fit(df, label_col, **kw)

    def _xgb_params(self) -> dict:
        p = super()._xgb_params()
        # xgboost requires num_class alongside any multi:* objective.
        if p["objective"].startswith("multi:"):
            p.setdefault("num_class", getattr(self, "n_classes_", 3))
        return p

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        scored = super().predict(df, output_col=output_col)
        # Classifier predict = class label (sklearn.py:825-835). MLlib's
        # transform emits the argmax class natively, and multi:softprob
        # boosters are argmax'd inside predict_barrier; a BINARY booster's
        # raw predict is the positive-class probability, so threshold it.
        if (
            self._result is not None
            and self._result.backend == "xgb"
            and getattr(self, "n_classes_", 2) <= 2
        ):
            from pyspark.sql import functions as F

            scored = scored.withColumn(
                output_col, (F.col(output_col) >= 0.5).cast("double")
            )
        return scored

    def predict_proba(self, df: DataFrame) -> DataFrame:
        return _predict_proba(self.model_, df, self._spec)


class _RFMixin:
    """Random-forest mode shared by both RF estimators (reference
    sklearn.py:602, :880): num_parallel_tree = n_estimators with a single
    boosting round, and the reference's RF defaults (sklearn.py:618-620)
    learning_rate=1, subsample=0.8, colsample_bynode=0.8 — without
    per-tree row/column subsampling all num_parallel_tree trees would
    train identically and the 'forest' degenerates to N copies of one
    tree. One definition so the two classes cannot drift."""

    _is_rf = True

    def __init__(
        self,
        *,
        learning_rate: float = 1.0,
        subsample: float = 0.8,
        colsample_bynode: float = 0.8,
        **kw: Any,
    ):
        super().__init__(
            learning_rate=learning_rate,
            subsample=subsample,
            colsample_bynode=colsample_bynode,
            **kw,
        )

    def _xgb_params(self) -> dict:
        # Keep the detected objective (binary:logistic / multi:softprob with
        # num_class) so the xgb backend trains a real probabilistic forest;
        # num_parallel_tree alone selects the RandomForest translation in the
        # MLlib backend (reference: sklearn.py:908-914).
        p = super()._xgb_params()
        p["num_parallel_tree"] = self.n_estimators
        return p


class SparkXGBRFRegressor(_RFMixin, SparkXGBRegressor):
    """Parity: RayXGBRFRegressor (sklearn.py:602) — see _RFMixin."""


class SparkXGBRFClassifier(_RFMixin, SparkXGBClassifier):
    """Parity: RayXGBRFClassifier (sklearn.py:880) — see _RFMixin."""


class SparkXGBRanker(_BaseEstimator):
    """Parity: RayXGBRanker (sklearn.py:921). qid is mandatory
    (sklearn.py:950-957); groups are clustered per partition by
    MatrixSpec.prepare (the reference's sort-by-qid, matrix.py:70-102).

    MLlib backend trains a pointwise surrogate (documented approximation);
    the xgboost backend runs true rank:pairwise.
    """

    _objective = "rank:pairwise"

    def fit(self, df: DataFrame, label_col: str, *, qid_col: str | None = None, **kw):
        if not qid_col:
            raise ValueError("SparkXGBRanker.fit requires qid_col")
        return super().fit(df, label_col, qid_col=qid_col, **kw)
