from .classic import (  # noqa: F401
    KNearest, KNearest_create,
    NormalBayesClassifier, NormalBayesClassifier_create,
    LogisticRegression, LogisticRegression_create,
    ROW_SAMPLE, COL_SAMPLE,
)
from .svm import SVM, SVM_create  # noqa: F401
from .svmsgd import SVMSGD  # noqa: F401


def SVMSGD_create():
    return SVMSGD.create()

from .trees import (  # noqa: F401
    DTrees, DTrees_create, RTrees, RTrees_create, Boost, Boost_create,
)
from .nets import ANN_MLP, ANN_MLP_create, EM, EM_create  # noqa: F401
