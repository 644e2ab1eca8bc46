"""VERDICT r3 #3 validation: calibrate() run THROUGH the axon tunnel must
reproduce the hand-measured v5e ROUTING now that every probe chains in one
jit (dispatch latency amortized) and the VMEM budget probe compiles the
exact programs the crossovers time (probe-what-you-fly).

Pass criteria are routing equivalence, not threshold equality — calibrate's
thresholds are coarse by design (docstring: "routing only needs the right
side of each crossover, not the exact knee"):

* the flagship train shape (B=200, N=784, H=128; BNH ~ 20.1M) routes to the
  fused Pallas path under BOTH the calibrated and the committed tuning;
* the below-cliff shape (B=64; BNH ~ 6.4M) routes to XLA under both;
* ``xla_fwd_max_bn`` resolves to the same finite 1<<19 knee (the Pallas
  forward wins the above-knee probe);
* the calibrated VMEM budget is at least the committed 16 MB (every probed
  budget is validated by compiling + running the crossover programs AND the
  gelu pre-grad config under it, so a larger surviving budget is evidence
  the platform fits it, not a risk).

Run (on the real chip):  python benchmarks/calibrate_tunnel.py
Committed log: benchmarks/logs/calibrate_tunnel_r04.log
"""
import sys

sys.path.insert(0, "/root/repo")
import pyroved_tpu as pv  # noqa: F401,E402
import pyroved_tpu.ops.spatial_decoder as sd  # noqa: E402

pv.utils.profiling.enable_compilation_cache()
kind = sd._device_kind()
committed = sd.DEVICE_TUNINGS.get(kind)
print(f"device_kind: {kind}")
print(f"committed tuning: {committed}")
if committed is None:
    sys.exit(f"no committed tuning for {kind!r}: nothing to validate against")
del sd.DEVICE_TUNINGS[kind]  # force a from-scratch calibration
try:
    t = sd.calibrate(verbose=True)
finally:
    sd.DEVICE_TUNINGS[kind] = committed  # restore the validated entry
print(f"calibrated tuning: {t}")

H = 128
flagship_bnh = 200 * 784 * H
cliff_bnh = 64 * 784 * H
ok_flagship = (flagship_bnh >= t.fused_min_bnh) == (
    flagship_bnh >= committed.fused_min_bnh)
ok_cliff = (cliff_bnh >= t.fused_min_bnh) == (
    cliff_bnh >= committed.fused_min_bnh)
ok_fwd = t.xla_fwd_max_bn == committed.xla_fwd_max_bn
ok_vmem = t.vmem_budget >= committed.vmem_budget
print(f"flagship (BNH={flagship_bnh}) routes fused under both: {ok_flagship}"
      f" (calibrated min {t.fused_min_bnh} vs committed "
      f"{committed.fused_min_bnh})")
print(f"below-cliff (BNH={cliff_bnh}) routes XLA under both: {ok_cliff}")
print(f"xla_fwd_max_bn matches committed: {ok_fwd} ({t.xla_fwd_max_bn} "
      f"vs {committed.xla_fwd_max_bn})")
print(f"vmem_budget >= committed: {ok_vmem} ({t.vmem_budget} "
      f"vs {committed.vmem_budget})")
print("CALIBRATE_TUNNEL_OK" if (ok_flagship and ok_cliff and ok_fwd
                                and ok_vmem)
      else "CALIBRATE_TUNNEL_MISMATCH")
