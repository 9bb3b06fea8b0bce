from .launch import args_sanity_check, initialize_distributed_env, launch

__all__ = ["args_sanity_check", "initialize_distributed_env", "launch"]
