"""Matrix-free user-callback solves (custom_operator.{c,f90} parity)."""

import sys

import pytest

import examples.custom_operator as co


@pytest.mark.parametrize("method", ["gmres", "cg", "bfbcg"])
def test_custom_operator_solve(method, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["custom_operator"])
    rc = co.main(["-n", "80", "-mu", "2",
                  "-hpddm_krylov_method", method])
    assert rc == 0
