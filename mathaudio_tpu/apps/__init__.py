"""CLI applications (the reference's L4 binaries, SURVEY.md §1):

- roomsim_fem / roomsim_bem: config-driven room simulation
  (math-fem/bin/room_simulator_fem.rs, math-bem/bin/room_simulator_bem.rs)
- qa_suite_fem / qa_suite_bem: analytical validation suites
- run_de / benchmark_convergence: optimizer CLI + strategy sweep

Run as ``python -m mathaudio_tpu.apps.<name> --help``.
"""
