// Link against native/libconstantine_tpu_protocols.so.
// Set CONSTANTINE_TPU_NATIVE_DIR to the directory containing the .so
// (defaults to ../../../native relative to this crate).
use std::env;
use std::path::PathBuf;

fn main() {
    let dir = env::var("CONSTANTINE_TPU_NATIVE_DIR").map(PathBuf::from)
        .unwrap_or_else(|_| {
            PathBuf::from(env::var("CARGO_MANIFEST_DIR").unwrap())
                .join("../../../native")
        });
    println!("cargo:rustc-link-search=native={}", dir.display());
    println!("cargo:rustc-link-lib=dylib=constantine_tpu_protocols");
    // the shim embeds CPython
    println!("cargo:rustc-link-lib=dylib=python3.12");
}
