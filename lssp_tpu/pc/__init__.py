"""Preconditioner framework (reference L3b, /root/reference/src/pc.cxx).

The reference's fn-pointer vtable (assemble/solve/destroy,
include/type-defs.h:142-145) becomes a ``Preconditioner`` pytree: a static
``apply_fn`` plus a device-array ``state``, so a PC flows through ``jit``
like data while the solver only ever calls ``M(r) -> z`` — the same uniform
"apply M⁻¹" contract as the reference's ``pc.solve(&pc, x, rhs)``.
"""

from lssp_tpu.pc.base import Preconditioner, setup, PC_REGISTRY
from lssp_tpu.pc.ilu_host import iluk_symbolic, ilu0_numeric, iluk_factor, ilut_factor
from lssp_tpu.pc import ilu as _ilu          # registers iluk/ilu0/ilut
from lssp_tpu.pc import biluk as _biluk      # registers biluk
from lssp_tpu.pc import amg as _amg          # registers amg
from lssp_tpu.pc import lu as _lu            # registers lu (direct)
from lssp_tpu.pc import relax as _relax      # registers ssor/sor/gs
from lssp_tpu.pc import arms as _arms        # registers arms
from lssp_tpu.pc import schwarz as _schwarz  # registers ras/schwarz/bjacobi
from lssp_tpu.pc import poly as _poly        # registers poly/chebyshev

__all__ = ["Preconditioner", "setup", "PC_REGISTRY",
           "iluk_symbolic", "ilu0_numeric", "iluk_factor", "ilut_factor"]
