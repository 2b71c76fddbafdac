#!/usr/bin/env python
"""Secondary user multicast beamforming.

  minimize ||x||^2
  s.t.     |h_i^H x|^2 >= tau   (nonconvex)
           |g_i^H x|^2 <= eta
with complex data realified to R^{2n}.  Mirrors the reference example
(reference: examples/secondary_user_beamforming.py).
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import qcqp_tpu as qt

n = 20
m = 5
l = 2

tau = 20.0
eta = 2.0

np.random.seed(1)
HR = np.random.randn(m, n)
HI = np.random.randn(m, n)
A = np.hstack((HR, HI))
B = np.hstack((-HI, HR))

GR = np.random.randn(l, n)
GI = np.random.randn(l, n)
C = np.hstack((GR, GI))
D = np.hstack((-GI, GR))

x = qt.Variable(2 * n)
obj = qt.Minimize(qt.sum_squares(x))
cons = [
    qt.square(A @ x) + qt.square(B @ x) >= tau,
    qt.square(C @ x) + qt.square(D @ x) <= eta,
]
prob = qt.Problem(obj, cons)
qcqp = qt.QCQP(prob)

qcqp.suggest(qt.SDR)
print("Lower bound from the Shor relaxation: %.3f" % qcqp.sdr_bound)

f_dccp, v_dccp = qcqp.improve(qt.DCCP)
print("penalty-CCP      f=%.3f  maxviol=%.3f" % (f_dccp, v_dccp))

qcqp.suggest(qt.SDR)
f, v = qcqp.improve(qt.COORD_DESCENT)
print("coord-descent    f=%.3f  maxviol=%.3f" % (f, v))
f, v = qcqp.improve(qt.ADMM, rho=np.sqrt(m + l))
print("coord-descent then consensus-ADMM   f=%.3f  maxviol=%.3f" % (f, v))
f, v = qcqp.improve(qt.COORD_DESCENT, phase1=False)
print("Coordinate descent + ADMM + coordinate descent: "
      "objective %.3f, violation %.3f" % (f, v))
