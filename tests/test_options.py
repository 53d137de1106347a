import pytest

from hpddm_tpu.options import Options


def test_defaults():
    opt = Options()
    assert opt.val("tol") == 1.0e-6
    assert opt.val("max_it") == 100
    assert opt.val("gmres_restart") == 40
    assert opt.val("krylov_method") == "gmres"
    assert opt.val("variant") == "right"
    assert opt.val("orthogonalization") == "cgs"
    assert opt.val("geneo_nu") == 20
    assert opt.val("schwarz_method") == "ras"


def test_kwargs_and_enum_validation():
    opt = Options(tol=1e-8, schwarz_method="oras")
    assert opt.val("tol") == 1e-8
    assert opt.val("schwarz_method") == "oras"
    with pytest.raises(ValueError):
        Options(schwarz_method="bogus")
    assert opt.enum_index("schwarz_method") == 1  # (ras|oras|...)


def test_cli_parse():
    opt = Options.parse(
        ["-hpddm_tol=1e-10", "-hpddm_max_it", "200",
         "-hpddm_schwarz_coarse_correction", "deflated",
         "-hpddm_level_2_p", "2", "-hpddm_verbosity"],
        display=False)
    assert opt.val("tol") == 1e-10
    assert opt.val("max_it") == 200
    assert opt.val("schwarz_coarse_correction") == "deflated"
    assert opt.level(2).val("p") == 2
    assert opt.set("verbosity")


def test_app_options():
    opt = Options.parse(["-Nx", "50", "-symmetric_csr", "1"], display=False,
                        app_options=[("Nx=<100>", "grid"), ("Ny=<100>", "grid"),
                                     ("symmetric_csr=(0|1)", "sym")])
    assert opt.app()["Nx"] == 50
    assert opt.app()["Ny"] == 100
    assert opt.app()["symmetric_csr"] == 1


def test_level_view_and_rename():
    opt = Options()
    opt["level_2_p"] = 4
    assert opt.level(2)["p"] == 4
    assert "p" in opt.level(2)
    o2 = opt.rename_level(2, 3)
    assert o2.level(3).val("p") == 4
    # defaults on levels
    assert opt.level(2).val("topology") == "0"


def test_config_file(tmp_path):
    cfg = tmp_path / "opts.cfg"
    cfg.write_text("# comment\ntol=1e-9\nhpddm_gmres_restart 30\n")
    opt = Options.parse([f"-hpddm_config_file={cfg}"], display=False)
    assert opt.val("tol") == 1e-9
    assert opt.val("gmres_restart") == 30
