//! Emit golden interop fixtures from real arkworks 0.4 as JSON on stdout.
//!
//! For each ceremony curve: CanonicalSerialize bytes (compressed and
//! uncompressed) of small generator multiples and the point at infinity,
//! for both source groups, plus hash-to-G2 outputs for fixed digests
//! (the reference's PoK challenge construction,
//! setup-utils/src/helpers.rs:277-291 — ChaChaRng seeded with the first
//! 32 digest bytes, rejection-sampling compressed-size byte strings
//! through from_random_bytes, multiplied by the cofactor).
//!
//! Usage:  cargo run --release > ark_fixtures.json
//! then copy the file to <repo>/tests/golden/ark_fixtures.json.

use ark_ec::{AffineRepr, CurveGroup};
use ark_serialize::CanonicalSerialize;
use blake2::{Blake2b, Digest};
use rand::{Rng, SeedableRng};

fn ser<P: CanonicalSerialize>(p: &P, compressed: bool) -> String {
    let mut v = Vec::new();
    if compressed {
        p.serialize_compressed(&mut v).unwrap();
    } else {
        p.serialize_uncompressed(&mut v).unwrap();
    }
    hex::encode(v)
}

fn hash_to_g2<G: AffineRepr>(digest: &[u8]) -> G::Group
where
    G::Group: CurveGroup<Affine = G>,
{
    assert!(digest.len() >= 32);
    let mut seed = [0u8; 32];
    seed.copy_from_slice(&digest[..32]);
    let mut rng = rand_chacha::ChaChaRng::from_seed(seed);
    let size = G::zero().compressed_size();
    loop {
        // raw bytes, flags included — exactly the reference's loop
        // (setup-utils/src/helpers.rs:277-291); from_random_bytes handles
        // the flag bits itself
        let bytes: Vec<u8> = (0..size).map(|_| rng.gen()).collect();
        if let Some(p) = G::from_random_bytes(&bytes) {
            let scaled = p.mul_by_cofactor_to_group();
            if !scaled.into_affine().is_zero() {
                return scaled;
            }
        }
    }
}

fn group_entries<G: AffineRepr>(items: &mut Vec<String>, name: &str)
where
    G::Group: CurveGroup<Affine = G>,
{
    let gen = G::generator();
    for k in 1u64..=4 {
        let p = (gen.into_group() * G::ScalarField::from(k)).into_affine();
        items.push(format!(
            "    \"{name}_mul{k}_comp\": \"{}\",\n    \"{name}_mul{k}_unc\": \"{}\"",
            ser(&p, true),
            ser(&p, false)
        ));
    }
    let inf = G::zero();
    items.push(format!(
        "    \"{name}_inf_comp\": \"{}\",\n    \"{name}_inf_unc\": \"{}\"",
        ser(&inf, true),
        ser(&inf, false)
    ));
    // hash-to-G2 style output for this group (used for the G2 groups only
    // by the verifier, but harmless to emit for G1 too)
    let mut h = Blake2b::new();
    h.update(b"ark_fixtures hash_to_g2 test digest");
    let digest = h.finalize();
    let ht = hash_to_g2::<G>(&digest).into_affine();
    items.push(format!("    \"{name}_hash2g\": \"{}\"", ser(&ht, true)));
}

fn curve<Gg1: AffineRepr, Gg2: AffineRepr>(out: &mut Vec<String>, cname: &str)
where
    Gg1::Group: CurveGroup<Affine = Gg1>,
    Gg2::Group: CurveGroup<Affine = Gg2>,
{
    let mut items = Vec::new();
    group_entries::<Gg1>(&mut items, "g1");
    group_entries::<Gg2>(&mut items, "g2");
    out.push(format!("  \"{cname}\": {{\n{}\n  }}", items.join(",\n")));
}

fn main() {
    let mut out = Vec::new();
    curve::<ark_bls12_377::G1Affine, ark_bls12_377::G2Affine>(&mut out, "bls12_377");
    curve::<ark_bls12_381::G1Affine, ark_bls12_381::G2Affine>(&mut out, "bls12_381");
    curve::<ark_bw6_761::G1Affine, ark_bw6_761::G2Affine>(&mut out, "bw6_761");
    curve::<ark_mnt4_753::G1Affine, ark_mnt4_753::G2Affine>(&mut out, "mnt4_753");
    curve::<ark_mnt6_753::G1Affine, ark_mnt6_753::G2Affine>(&mut out, "mnt6_753");
    println!("{{\n{}\n}}", out.join(",\n"));
}
