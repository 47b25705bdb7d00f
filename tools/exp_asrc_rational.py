"""Round-5 closure probe: can the ASRC exploit constant-ratio-within-a-
call structure via rational-step pattern tiling?  (SOL.md "Constant-
ratio-within-a-call structure: evaluated and closed".)

The fixed-path banked-matmul trick requires 1/ratio rational with
denominator <= 1024 (the engine's filter-reduction bound) to within
~1e-8 accumulated phase error per call (streams.PATTERN_TOL class).
This measures how often the shipped endurance/wide-drift call patterns
qualify: the answer is 0 of 2128, with the best rational approximation
accumulating 1.8e-4 input samples of phase error per 512K-output call.
Pure host arithmetic — no TPU needed.
"""

from fractions import Fraction

import numpy as np


def main():
    tol = 1e-8                 # phase tolerance per call (PATTERN_TOL)
    kb = 512 * 1024            # outputs per stream per call (chunk class)
    hits = tot = 0
    best, worst = np.inf, 0.0
    for t0 in range(1, 134):
        for s in range(0, 256, 17):
            for drift in (0.01, 0.10):          # endurance / wide-drift
                r = 1.0 + drift * np.sin(s * 0.1 + 0.031 * t0)
                step = 1.0 / r
                f = Fraction(step).limit_denominator(1024)
                e = abs(step - float(f)) * kb
                tot += 1
                hits += e < tol
                best, worst = min(best, e), max(worst, e)
    print(f"calls with a usable rational step: {hits}/{tot}")
    print(f"accumulated per-call phase error: best {best:.3e} "
          f"worst {worst:.3e} (need < {tol})")


if __name__ == "__main__":
    main()
