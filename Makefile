# Common entry points. CPU targets unset the TPU-tunnel plugin env
# (see CLAUDE.md: initializing the axon backend can block CPU work).
CPU_ENV := env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu

.PHONY: test bench bench-all bench-reference demo-pendulum demo-particle dryrun

test:
	$(CPU_ENV) python -m pytest tests/ -q

bench:
	python bench.py

bench-all:
	python bench/bench_all.py --quick

bench-reference:
	python bench/reference_bench.py --config pendulum_dust --steps 60

demo-pendulum:
	$(CPU_ENV) python demo/pendulum_example.py --steps 200

demo-particle:
	$(CPU_ENV) python demo/particle_example.py --steps 400 --render

dryrun:
	$(CPU_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python __graft_entry__.py
