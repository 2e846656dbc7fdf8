// Independent CPU oracle for multi-limb Montgomery field arithmetic.
//
// Role (SURVEY.md §7 "oracle/"): the reference stack (arkworks) is not
// available in this environment, so correctness of the JAX limb kernels and
// the Python-int host field is cross-checked against this third,
// independently written implementation: 64-bit-limb CIOS Montgomery
// multiplication with __uint128_t carries, schoolbook everything, no shared
// code or representation with either other implementation.
//
// C ABI (driven from Python via ctypes, see oracle/__init__.py):
//   field sizes up to MAX_LIMBS*64 = 768 bits (covers MNT4/6-753).
//   All values are little-endian u64 limb arrays of length n.

#include <cstdint>
#include <cstring>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

static const int MAX_LIMBS = 12;

namespace {

struct Ctx {
    int n;            // limb count
    u64 mod[MAX_LIMBS];
    u64 inv;          // -mod^{-1} mod 2^64
    u64 r2[MAX_LIMBS]; // R^2 mod mod (for to-Montgomery)
};

int cmp(const u64* a, const u64* b, int n) {
    for (int i = n - 1; i >= 0; --i) {
        if (a[i] < b[i]) return -1;
        if (a[i] > b[i]) return 1;
    }
    return 0;
}

// a -= b, returns borrow
u64 sub_in(u64* a, const u64* b, int n) {
    u64 borrow = 0;
    for (int i = 0; i < n; ++i) {
        u128 d = (u128)a[i] - b[i] - borrow;
        a[i] = (u64)d;
        borrow = (u64)(d >> 64) & 1;
    }
    return borrow;
}

u64 add_in(u64* a, const u64* b, int n) {
    u64 carry = 0;
    for (int i = 0; i < n; ++i) {
        u128 s = (u128)a[i] + b[i] + carry;
        a[i] = (u64)s;
        carry = (u64)(s >> 64);
    }
    return carry;
}

// CIOS Montgomery multiplication: out = a*b*R^{-1} mod m
void mont_mul_ctx(const Ctx& c, const u64* a, const u64* b, u64* out) {
    int n = c.n;
    u64 t[MAX_LIMBS + 2];
    std::memset(t, 0, sizeof(t));
    for (int i = 0; i < n; ++i) {
        u64 carry = 0;
        for (int j = 0; j < n; ++j) {
            u128 s = (u128)t[j] + (u128)a[i] * b[j] + carry;
            t[j] = (u64)s;
            carry = (u64)(s >> 64);
        }
        u128 s = (u128)t[n] + carry;
        t[n] = (u64)s;
        t[n + 1] = (u64)(s >> 64);

        u64 m = t[0] * c.inv;
        u128 s2 = (u128)t[0] + (u128)m * c.mod[0];
        carry = (u64)(s2 >> 64);
        for (int j = 1; j < n; ++j) {
            u128 s3 = (u128)t[j] + (u128)m * c.mod[j] + carry;
            t[j - 1] = (u64)s3;
            carry = (u64)(s3 >> 64);
        }
        u128 s4 = (u128)t[n] + carry;
        t[n - 1] = (u64)s4;
        t[n] = t[n + 1] + (u64)(s4 >> 64);
        t[n + 1] = 0;
    }
    if (t[n] != 0 || cmp(t, c.mod, n) >= 0) {
        sub_in(t, c.mod, n);
    }
    std::memcpy(out, t, n * sizeof(u64));
}

void make_ctx(Ctx& c, const u64* mod, int n) {
    c.n = n;
    std::memcpy(c.mod, mod, n * sizeof(u64));
    // inv = -mod^{-1} mod 2^64 by Newton iteration
    u64 inv = 1;
    for (int i = 0; i < 63; ++i) inv *= 2 - mod[0] * inv;
    c.inv = ~inv + 1;
    // r2 = R^2 mod m by 2n*64 doublings of R mod m... compute R mod m first:
    // R = 2^(64n). Start from 1, double 128n times mod m -> R^2 mod m.
    u64 acc[MAX_LIMBS];
    std::memset(acc, 0, sizeof(acc));
    acc[0] = 1;
    for (int i = 0; i < 128 * n; ++i) {
        u64 carry = add_in(acc, acc, n);
        if (carry || cmp(acc, c.mod, n) >= 0) sub_in(acc, c.mod, n);
    }
    std::memcpy(c.r2, acc, n * sizeof(u64));
}

}  // namespace

extern "C" {

// batch: out[i] = a[i]*b[i]*R^{-1} mod m (Montgomery-domain product)
int oracle_mont_mul_batch(const u64* mod, int n, const u64* a, const u64* b,
                          u64* out, int count) {
    if (n <= 0 || n > MAX_LIMBS) return -1;
    Ctx c;
    make_ctx(c, mod, n);
    for (int k = 0; k < count; ++k) {
        mont_mul_ctx(c, a + k * n, b + k * n, out + k * n);
    }
    return 0;
}

// batch plain modular multiplication: out = a*b mod m (standard domain)
int oracle_mod_mul_batch(const u64* mod, int n, const u64* a, const u64* b,
                         u64* out, int count) {
    if (n <= 0 || n > MAX_LIMBS) return -1;
    Ctx c;
    make_ctx(c, mod, n);
    u64 am[MAX_LIMBS], bm[MAX_LIMBS], pm[MAX_LIMBS], one[MAX_LIMBS];
    std::memset(one, 0, sizeof(one));
    one[0] = 1;
    for (int k = 0; k < count; ++k) {
        // to Montgomery: x*R = mont_mul(x, R^2)
        mont_mul_ctx(c, a + k * n, c.r2, am);
        mont_mul_ctx(c, b + k * n, c.r2, bm);
        mont_mul_ctx(c, am, bm, pm);
        mont_mul_ctx(c, pm, one, out + k * n);  // back from Montgomery
    }
    return 0;
}

// batch modular exponentiation (square-and-multiply, MSB-first)
int oracle_mod_pow_batch(const u64* mod, int n, const u64* base,
                         const u64* exp, u64* out, int count) {
    if (n <= 0 || n > MAX_LIMBS) return -1;
    Ctx c;
    make_ctx(c, mod, n);
    u64 one[MAX_LIMBS];
    std::memset(one, 0, sizeof(one));
    one[0] = 1;
    for (int k = 0; k < count; ++k) {
        u64 bm[MAX_LIMBS], acc[MAX_LIMBS];
        mont_mul_ctx(c, base + k * n, c.r2, bm);      // base*R
        mont_mul_ctx(c, one, c.r2, acc);              // 1*R
        const u64* e = exp + k * n;
        for (int bit = 64 * n - 1; bit >= 0; --bit) {
            mont_mul_ctx(c, acc, acc, acc);
            if ((e[bit / 64] >> (bit % 64)) & 1) {
                mont_mul_ctx(c, acc, bm, acc);
            }
        }
        mont_mul_ctx(c, acc, one, out + k * n);
    }
    return 0;
}

}  // extern "C"
