"""Deck parser unit tests (format per reference input decks and the mutation
semantics of tst/regression_test.py)."""

import pytest

from jaybenne_tpu.utils.deck import Deck, DeckError

SAMPLE = """
<parthenon/job>
problem_id = stepdiff   # trailing comment

<parthenon/mesh>
nx1 = 100
x1min = -0.5
x1max = 0.5

<jaybenne>
do_emission = false
dead_key = tolerated
seed = 349857

<parthenon/output0>
variables = field.material.density,  &
            field.jaybenne.energy_tally
"""


def test_parse_basic():
    d = Deck.parse(SAMPLE)
    assert d.get_str("parthenon/job", "problem_id") == "stepdiff"
    assert d.get_int("parthenon/mesh", "nx1") == 100
    assert d.get_real("parthenon/mesh", "x1min") == -0.5
    assert d.get_bool("jaybenne", "do_emission") is False
    assert d.get_int("jaybenne", "seed") == 349857


def test_continuation():
    d = Deck.parse(SAMPLE)
    assert d.get_list("parthenon/output0", "variables") == [
        "field.material.density",
        "field.jaybenne.energy_tally",
    ]


def test_dead_keys_tolerated():
    d = Deck.parse(SAMPLE)
    assert d.get_str("jaybenne", "dead_key") == "tolerated"


def test_get_or_add():
    d = Deck.parse(SAMPLE)
    assert d.get_or_add_real("jaybenne", "tau_ddmc", 5.0) == 5.0
    # now present; subsequent get sees the added default
    assert d.get_real("jaybenne", "tau_ddmc") == 5.0
    # existing key unaffected
    assert d.get_or_add_int("parthenon/mesh", "nx1", 7) == 100


def test_mutation_roundtrip():
    d = Deck.parse(SAMPLE)
    d.set("parthenon/mesh/nx1", 128)
    d.set("parthenon/meshblock/nx1", 128)  # creates block
    text = d.dumps()
    d2 = Deck.parse(text)
    assert d2.get_int("parthenon/mesh", "nx1") == 128
    assert d2.get_int("parthenon/meshblock", "nx1") == 128


def test_missing_required():
    d = Deck.parse(SAMPLE)
    with pytest.raises(DeckError):
        d.get_str("parthenon/mesh", "nope")


def test_reference_decks_parse():
    import glob
    import os

    decks = glob.glob(os.path.join(os.path.dirname(__file__), "../inputs/*.in"))
    assert decks
    for path in decks:
        d = Deck.from_file(path)
        assert d.get_str("parthenon/job", "problem_id")


def test_all_decks_build_full_config():
    """Every shipped deck parses into a complete RunConfig with constructible
    physics models and a buildable mesh."""
    import glob
    import os

    from jaybenne_tpu import config as cfg_mod
    from jaybenne_tpu.mesh import build_mesh

    decks = sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "../inputs/*.in"))
    )
    assert len(decks) == 10  # 7 reference decks + 3D, Su-Olson, level-2 SMR extensions
    for path in decks:
        cfg = cfg_mod.from_file(path)
        cfg.mcblock.build_eos()
        cfg.mcblock.build_opacity()
        cfg.mcblock.build_scattering()
        mesh = build_mesh(cfg.mesh, use_native=False)
        assert mesh.n_blocks >= 1
        assert cfg.jaybenne.num_particles > 0
        if "smr2" in os.path.basename(path):
            assert mesh.max_level == 2
        elif "smr" in os.path.basename(path):
            assert mesh.max_level == 1
