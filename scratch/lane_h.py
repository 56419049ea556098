import sys; sys.path.insert(0, "/root/repo")
from experiments.fleet import run_job
# second warm start from the plateaued stage-1 state (+7.2 mHa): 100 more
# exact steps -> refit to the CISDTQ ground state with 3x fit epochs ->
# 2400-step polish
job = {"name": "h2o_631g_x4", "molecule": "H2O_6-31G", "env": {},
       "args": ["-m", "H2O_6-31G", "-n_train", "6500", "-s", "11",
                "-n_hid", "64", "-n_layer", "1", "-n_hid_phase", "512",
                "-n_layer_phase", "2", "-single_phase", "-save_freq", "500",
                "-loadH", "-n_samps", "1e7", "-n_unq_samps_min", "256",
                "-n_unq_samps_max", "4096", "-n_excitations_max", "4",
                "-exact_sampling", "-ws_solve_h", "4100",
                "-ws_epochs", "1500"]}
run_job(job, stall_secs=900)
