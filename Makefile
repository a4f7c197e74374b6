# hullwhite_tpu — build & run targets (analogue of the reference makefile)

.PHONY: native test tpu-test q1 q2 q3 benchmark all analyze bench clean cms exotics notes \
        g2pp swaption cap grid calibrate products results-check

# consistency gate: RESULTS.md flagship claims <-> data/ artifacts <->
# newest BENCH_r*.json (round-5; fails loudly on the round-4 drift class)
results-check:
	python tools/results_check.py

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

tpu-test:
	python -m pytest tpu_tests/ -q

q1:
	python -m hullwhite_tpu.cli q1

q2:
	python -m hullwhite_tpu.cli q2 --validate 20

q3:
	python -m hullwhite_tpu.cli q3 --validate 20

benchmark:
	python -m hullwhite_tpu.cli benchmark --sweep

all:
	python -m hullwhite_tpu.cli all

g2pp:
	python -m hullwhite_tpu.cli g2pp

swaption:
	python -m hullwhite_tpu.cli swaption --bermudan --delta --bermudan-sweep

calibrate:
	python -m hullwhite_tpu.cli calibrate

# every beyond-reference product surface in one go (after q1)
products: swaption cap cms exotics notes grid g2pp calibrate

cap:
	python -m hullwhite_tpu.cli cap

cms:
	python -m hullwhite_tpu.cli cms

exotics:
	python -m hullwhite_tpu.cli exotics

notes:
	python -m hullwhite_tpu.cli notes

grid:
	python -m hullwhite_tpu.cli grid

analyze:
	python -m hullwhite_tpu.analyze

bench:
	python bench.py

clean:
	rm -rf data plots
	$(MAKE) -C native clean
