"""Cross-check the clean-room oracle against the actual reference code.

Runs the reference's ICM_ROS solver (imported from /root/reference with a
stubbed roslibpy and a direct .mat feed — no network) next to our oracle on a
trajectory prefix, and reports max trajectory/map deviation.  Used once to
certify the oracle; not part of the test suite (the reference tree is not
available in CI).
"""
import sys
import types
import numpy as np
import scipy.io as sio

# --- stub roslibpy so the reference modules import without ROS -----------
stub = types.ModuleType("roslibpy")
stub.Ros = object
stub.Topic = object
stub.Service = object
sys.modules["roslibpy"] = stub
# old numpy alias used by sensors_definitions (np.float removed in numpy>=1.24)
if not hasattr(np, "float"):
    np.float = float

sys.path.insert(0, "/root/reference/scripts")
sys.path.insert(0, "/root/repo/tests/oracle")

from ICM_ROS import ICM_ROS  # noqa: E402
from ICM_SLAM_tools import ConfigICM, Mapa, filtrar_z, tras_rot_z  # noqa: E402
from reference_oracle import OracleParams, run_pipeline  # noqa: E402

T = int(sys.argv[1]) if len(sys.argv) > 1 else 300
N_ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

m = sio.loadmat("/root/reference/scripts/data_IJAC2018.mat")
scans_raw = m["observations"][:, :T]
odom = m["odometry"][:, :T]
u = m["velocities"][:, :T]

# ---- run the reference solver, bypassing ROS ----------------------------
cfg = ConfigICM("/root/reference/scripts/config_ros.yaml")
icm = ICM_ROS(cfg)
z = np.nan_to_num(scans_raw, nan=cfg.rango_laser_max)
icm.mediciones = np.minimum(z + cfg.radio, cfg.rango_laser_max)
icm.odometria = odom.copy()
icm.u = u.copy()
icm.x0 = odom[:, 0:1].copy()

# replicate inicializar_online's per-frame loop without the ROS plumbing
icm.mapa_obj = Mapa(cfg)
xt = icm.x0.copy()
x = icm.x0.copy()
y = np.zeros((2, cfg.L))
z0 = filtrar_z(icm.mediciones[:, 0], cfg)
zt = tras_rot_z(xt, z0)
y, c = icm.mapa_obj.actualizar(y, y, zt[:, 2:4])
icm.t = 1
for t in range(1, T):
    y, xt = icm.inicializar_online_process(y, xt)
    xt = np.reshape(xt, (3, 1))
    x = np.concatenate((x, xt), axis=1)
    icm.t += 1
yy = icm.mapa_obj.filtrar(y)[:, : icm.mapa_obj.landmarks_actuales]
ref_map, ref_x = yy.copy(), x.copy()
for k in range(N_ITERS):
    ref_map, ref_x = icm.iterations_process_offline(ref_map, ref_x)

# ---- run the oracle -------------------------------------------------------
p = OracleParams(N=N_ITERS)
out = run_pipeline(scans_raw, odom, u, p, verbose=False)

dx = np.abs(out["x"] - ref_x).max()
print(f"T={T} N={N_ITERS}")
print(f"max |x_oracle - x_reference| = {dx:.3e}")
print(f"oracle map {out['map'].shape}, reference map {ref_map.shape}")
if out["map"].shape == ref_map.shape:
    print(f"max |map diff| = {np.abs(out['map'] - ref_map).max():.3e}")
assert dx < 1e-9, "oracle deviates from reference"
print("ORACLE VERIFIED")
