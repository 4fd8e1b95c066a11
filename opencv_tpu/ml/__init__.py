from .classic import (  # noqa: F401
    KNearest, KNearest_create,
    NormalBayesClassifier, NormalBayesClassifier_create,
    LogisticRegression, LogisticRegression_create,
    ROW_SAMPLE, COL_SAMPLE,
)
