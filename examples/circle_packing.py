#!/usr/bin/env python
"""Circle packing: maximize the common radius of n non-overlapping circles
in a box.  Mirrors the reference example (reference: examples/circle_packing.py)
minus the matplotlib plot.
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import qcqp_tpu as qt

n = 5  # number of circles
B = 10.0
X = qt.Variable(2, n)
r = qt.Variable()
obj = qt.Maximize(r)
cons = [X >= r, X <= B - r, r >= 0]
for i in range(n):
    for j in range(i + 1, n):
        cons.append(qt.square(2 * r) <= qt.sum_squares(X[:, i] - X[:, j]))

prob = qt.Problem(obj, cons)
qcqp = qt.QCQP(prob)

qcqp.suggest(qt.SDR)
print("SDR-based upper bound: %.3f" % qcqp.sdr_bound)

f_cd, v_cd = qcqp.improve(qt.COORD_DESCENT)
print("Coordinate descent: objective %.3f, violation %.3f" % (f_cd, v_cd))

qcqp.suggest(qt.SDR)
f_dccp, v_dccp = qcqp.improve(qt.DCCP)
print("Penalty CCP: objective %.3f, violation %.3f" % (f_dccp, v_dccp))

qcqp.suggest(qt.SDR)
f_admm, v_admm = qcqp.improve(qt.ADMM)
print("Nonconvex ADMM: objective %.3f, violation %.3f" % (f_admm, v_admm))
