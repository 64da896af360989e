// LZ4-block-format codec — the native compression path for world/prefab blobs
// (≙ the reference's external/lz4 used by engine/world.cpp serialize and
// Engine::compress). Implements the standard LZ4 block format (greedy
// hash-chain matcher), self-contained, no external deps.
//
// Built by lumixengine_tpu/utils/native.py with g++ -O3 and loaded via ctypes;
// engine/serialize.py falls back to zlib when the toolchain is unavailable.

#include <cstdint>
#include <cstring>

namespace {

constexpr int MIN_MATCH = 4;
constexpr int HASH_LOG = 16;
constexpr int HASH_SIZE = 1 << HASH_LOG;
constexpr int MAX_DISTANCE = 65535;
constexpr int LAST_LITERALS = 5;   // spec: last 5 bytes are always literals
constexpr int MFLIMIT = 12;        // spec: no match may start within 12 bytes of end

inline uint32_t read32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

inline uint32_t hash4(uint32_t v) {
    return (v * 2654435761u) >> (32 - HASH_LOG);
}

}  // namespace

extern "C" {

// worst case: incompressible data expands by ~0.4%
int lxt_lz4_bound(int src_len) { return src_len + src_len / 255 + 16; }

int lxt_lz4_compress(const uint8_t* src, int src_len, uint8_t* dst, int dst_cap) {
    if (src_len < 0 || dst_cap < lxt_lz4_bound(src_len)) return -1;
    uint32_t table[HASH_SIZE];
    std::memset(table, 0, sizeof(table));

    const uint8_t* ip = src;
    const uint8_t* const iend = src + src_len;
    const uint8_t* const mflimit = iend - MFLIMIT;
    const uint8_t* anchor = src;
    uint8_t* op = dst;

    if (src_len >= MFLIMIT) {
        while (ip < mflimit) {
            // find a match via single-entry hash table
            uint32_t h = hash4(read32(ip));
            const uint8_t* match = src + table[h];
            table[h] = (uint32_t)(ip - src);
            if (match >= ip || ip - match > MAX_DISTANCE || read32(match) != read32(ip)) {
                ++ip;
                continue;
            }
            // extend match forward
            const uint8_t* mp = match + MIN_MATCH;
            const uint8_t* sp = ip + MIN_MATCH;
            const uint8_t* match_limit = iend - LAST_LITERALS;
            while (sp < match_limit && *sp == *mp) { ++sp; ++mp; }
            int match_len = (int)(sp - ip) - MIN_MATCH;
            int lit_len = (int)(ip - anchor);

            // token
            uint8_t* token = op++;
            *token = 0;
            if (lit_len >= 15) {
                *token = 15 << 4;
                int rest = lit_len - 15;
                while (rest >= 255) { *op++ = 255; rest -= 255; }
                *op++ = (uint8_t)rest;
            } else {
                *token = (uint8_t)(lit_len << 4);
            }
            std::memcpy(op, anchor, lit_len);
            op += lit_len;

            // offset
            uint16_t off = (uint16_t)(ip - match);
            *op++ = (uint8_t)(off & 0xff);
            *op++ = (uint8_t)(off >> 8);

            // match length
            if (match_len >= 15) {
                *token |= 15;
                int rest = match_len - 15;
                while (rest >= 255) { *op++ = 255; rest -= 255; }
                *op++ = (uint8_t)rest;
            } else {
                *token |= (uint8_t)match_len;
            }
            ip = sp;
            anchor = ip;
        }
    }

    // trailing literals
    int lit_len = (int)(iend - anchor);
    uint8_t* token = op++;
    if (lit_len >= 15) {
        *token = 15 << 4;
        int rest = lit_len - 15;
        while (rest >= 255) { *op++ = 255; rest -= 255; }
        *op++ = (uint8_t)rest;
    } else {
        *token = (uint8_t)(lit_len << 4);
    }
    std::memcpy(op, anchor, lit_len);
    op += lit_len;
    return (int)(op - dst);
}

int lxt_lz4_decompress(const uint8_t* src, int src_len, uint8_t* dst, int dst_cap) {
    const uint8_t* ip = src;
    const uint8_t* const iend = src + src_len;
    uint8_t* op = dst;
    uint8_t* const oend = dst + dst_cap;

    while (ip < iend) {
        uint8_t token = *ip++;
        // literals
        int lit_len = token >> 4;
        if (lit_len == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                lit_len += b;
            } while (b == 255);
        }
        if (ip + lit_len > iend || op + lit_len > oend) return -1;
        std::memcpy(op, ip, lit_len);
        ip += lit_len;
        op += lit_len;
        if (ip >= iend) break;  // block ends with literals

        // match
        if (ip + 2 > iend) return -1;
        uint16_t off = (uint16_t)(ip[0] | (ip[1] << 8));
        ip += 2;
        if (off == 0 || op - dst < off) return -1;
        int match_len = (token & 15);
        if (match_len == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                match_len += b;
            } while (b == 255);
        }
        match_len += MIN_MATCH;
        if (op + match_len > oend) return -1;
        const uint8_t* mp = op - off;
        // overlapping copy must be byte-wise
        for (int i = 0; i < match_len; ++i) op[i] = mp[i];
        op += match_len;
    }
    return (int)(op - dst);
}

}  // extern "C"
