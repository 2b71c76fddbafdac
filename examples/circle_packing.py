#!/usr/bin/env python
"""Circle packing: maximize the common radius of n non-overlapping circles
in a box.  Mirrors the reference example (reference: examples/circle_packing.py),
including the matplotlib rendering (reference: circle_packing.py:39-48) —
saved to circle_packing.png rather than shown interactively.
"""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import qcqp_tpu as qt

n = 5  # circles to pack
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
print("Upper bound from the Shor relaxation: %.3f" % qcqp.sdr_bound)

f_cd, v_cd = qcqp.improve(qt.COORD_DESCENT)
print("coord-descent    f=%.3f  maxviol=%.3f" % (f_cd, v_cd))

qcqp.suggest(qt.SDR)
f_dccp, v_dccp = qcqp.improve(qt.DCCP)
print("penalty-CCP      f=%.3f  maxviol=%.3f" % (f_dccp, v_dccp))

qcqp.suggest(qt.SDR)
f_admm, v_admm = qcqp.improve(qt.ADMM)
print("consensus-ADMM   f=%.3f  maxviol=%.3f" % (f_admm, v_admm))


def plot_packing(centers, radius, box, path):
    """Render the packing (reference: examples/circle_packing.py:39-48),
    written to a PNG so it runs headless."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plot")
        return
    fig, ax = plt.subplots(figsize=(5, 5))
    for k in range(centers.shape[1]):
        ax.add_patch(plt.Circle(centers[:, k], radius,
                                fill=False, edgecolor="C0"))
    ax.add_patch(plt.Rectangle((0, 0), box, box, fill=False,
                               edgecolor="k", linewidth=1.5))
    ax.set_xlim(-0.5, box + 0.5)
    ax.set_ylim(-0.5, box + 0.5)
    ax.set_aspect("equal")
    ax.set_title("r = %.3f" % radius)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print("wrote %s" % path)


out_png = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "circle_packing.png")
plot_packing(np.asarray(X.value), float(r.value), B, out_png)
