#!/usr/bin/env python
"""MAXCUT:  maximize 0.25 (sum(W) - x^T W x)  s.t.  x_i^2 == 1.

Mirrors the reference example (reference: examples/maxcut.py).
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import qcqp_tpu as qt

n = 25
np.random.seed(1)

# Erdos-Renyi-ish adjacency matrix
p = 0.2
W = np.random.uniform(low=0.0, high=1.0, size=(n, n))
for i in range(n):
    W[i, i] = 1
    for j in range(i + 1, n):
        W[j, i] = W[i, j]
W = (W < p).astype(float)

x = qt.Variable(n)
obj = 0.25 * (qt.sum_entries(W) - qt.quad_form(x, W))
cons = [qt.square(x) == 1]
prob = qt.Problem(qt.Maximize(obj), cons)
qcqp = qt.QCQP(prob)

qcqp.suggest(qt.SDR)
print("Upper bound from the Shor relaxation: %.3f" % qcqp.sdr_bound)

f_cd, v_cd = qcqp.improve(qt.COORD_DESCENT)
print("coord-descent    f=%.3f  maxviol=%.3f" % (f_cd, v_cd))

qcqp.suggest(qt.SDR)
f_dccp, v_dccp = qcqp.improve(qt.DCCP, tau=1)
print("penalty-CCP      f=%.3f  maxviol=%.3f" % (f_dccp, v_dccp))

qcqp.suggest(qt.SDR)
f_admm, v_admm = qcqp.improve(qt.ADMM)
print("consensus-ADMM   f=%.3f  maxviol=%.3f" % (f_admm, v_admm))
