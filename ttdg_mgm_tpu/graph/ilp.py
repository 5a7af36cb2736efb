"""Exact LAP via integer programming (optional; gurobi-gated).

Capability of reference ``utils/ILP.py:28-168`` (``ILP_solver``): exact
linear-assignment with dummy-node support, used only by the (inactive)
``ILP_attention_loss``.  gurobipy is an optional commercial dependency (absent
in this image); the solver falls back to the on-device Jonker-Volgenant LAP
(``ops.lap``), which is exact for the pure assignment case the reference
exercises.
"""

from __future__ import annotations

import numpy as np


def ilp_solver(cost: np.ndarray, n1: int | None = None, n2: int | None = None,
               maximize: bool = True) -> np.ndarray:
    """0/1 assignment matrix for a (possibly rectangular) cost matrix."""
    try:
        import gurobipy as gp  # optional
        from gurobipy import GRB

        nr, nc = cost.shape
        n1 = nr if n1 is None else n1
        n2 = nc if n2 is None else n2
        m = gp.Model()
        m.Params.OutputFlag = 0
        x = m.addVars(n1, n2, vtype=GRB.BINARY)
        m.setObjective(
            gp.quicksum(cost[i, j] * x[i, j] for i in range(n1) for j in range(n2)),
            GRB.MAXIMIZE if maximize else GRB.MINIMIZE,
        )
        for i in range(n1):
            m.addConstr(gp.quicksum(x[i, j] for j in range(n2)) <= 1)
        for j in range(n2):
            m.addConstr(gp.quicksum(x[i, j] for i in range(n1)) <= 1)
        m.optimize()
        out = np.zeros_like(cost, dtype=np.float32)
        for i in range(n1):
            for j in range(n2):
                if x[i, j].X > 0.5:
                    out[i, j] = 1.0
        return out
    except ImportError:
        from ttdg_mgm_tpu.ops.lap import hungarian_scipy

        s = cost if maximize else -cost
        return hungarian_scipy(s, [n1] if n1 else None, [n2] if n2 else None)
