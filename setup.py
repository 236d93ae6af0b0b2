from setuptools import find_packages, setup

setup(
    name="miniprot_tpu",
    version="0.1.0",
    description="TPU-native protein-to-genome aligner (miniprot capability)",
    packages=find_packages(exclude=("tests",)),
    package_data={"miniprot_tpu.native": ["*.c"]},
    python_requires=">=3.10",
    install_requires=["numpy"],
    extras_require={"tpu": ["jax"]},
    entry_points={"console_scripts": ["miniprot-tpu=miniprot_tpu.cli:main"]},
)
