"""One-number host-speed probe (r14): a fixed single-thread CPU loop,
printed in seconds. Calibrates measurement phases on this shared VM —
the r13/r14 sessions documented 2-4x wall-clock swings at zero local
load (hypervisor contention). Run before/after any timing run; compare
to the recorded quiet-phase value in OPTIMIZATION_r14.md (~0.55s)."""
import time

t0 = time.perf_counter()
acc = 0
for i in range(10_000_000):
    acc += i * i
print(f"{time.perf_counter() - t0:.3f}")
