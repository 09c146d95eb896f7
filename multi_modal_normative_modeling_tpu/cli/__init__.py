"""Argparse entry points with the reference scripts' exact flag surface, so
the commands_list*.sh drivers run against this framework unmodified."""
