#!/usr/bin/env python
"""Augmented Python console for poking at a trained TransformerVAE:
``python vae-console.py <run-name>``.

Counterpart of /root/reference/vae-console.py: `load <name>` swaps
checkpoints, `encode <text>` stores the posterior in the environment, `help`
lists commands, and anything else is executed as Python against the live
environment (:21-64).
"""
import sys

import jax
import jax.numpy as jnp

user_env = {}


def load(version_name):
    from sparse_vae_tpu import load_checkpoint_for_name
    module, hparams, objective, state, meta = load_checkpoint_for_name(
        "transformer-vae", version_name)
    user_env["vae"] = module
    user_env["params"] = state["params"]
    user_env["meta"] = meta
    from sparse_vae_tpu.cli import assemble_config, build_data
    cfg = assemble_config("transformer-vae", [])
    cfg.data = type(cfg.data)(**meta.get("data_hparams", {}))
    data = build_data(cfg)
    user_env["tokenizer"] = data.tokenizer
    print(f"Loaded transformer VAE run '{version_name}'.")


def encode(user_string):
    ids = user_env["tokenizer"].encode(user_string).ids
    tokens = jnp.asarray(ids, jnp.int32)[None, :]
    module = user_env["vae"]
    user_env["posterior"] = module.apply(
        {"params": user_env["params"]}, tokens, method=type(module).posterior)
    print("posterior loc:", user_env["posterior"].loc)


def print_help(_=None):
    print(list(commands.keys()))


commands = {"encode": encode, "load": load, "help": print_help}


def main(args):
    if len(args) > 1:
        load(args[1])
    else:
        print("No run loaded; use `load <run-name>`.")
    print("This is an augmented Python console. Type 'help' for commands.")
    while True:
        try:
            command = input(">>> ")
        except EOFError:
            return
        if command in ("q", "quit", "exit"):
            return

        for cmd_name, func in commands.items():
            if command == cmd_name:
                func() if cmd_name == "help" else func("")
                break
            if command.startswith(cmd_name + " "):
                func(command[len(cmd_name) + 1:])
                break
        else:
            try:
                result = eval(command, globals(), user_env)  # noqa: S307
                if result is not None:
                    print(result)
            except SyntaxError:
                try:
                    exec(command, globals(), user_env)  # noqa: S102
                except Exception as e:
                    print(repr(e))
            except Exception as e:
                print(repr(e))


if __name__ == "__main__":
    main(sys.argv)
