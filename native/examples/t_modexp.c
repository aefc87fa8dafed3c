/* Smoke test for the protocol C ABI (modexp path: no device needed). */
#include <stdio.h>
#include <string.h>
#include "../include/constantine_tpu_protocols.h"

int main(void) {
  /* 8^7 mod 100 = 2097152 mod 100 = 52 */
  byte calldata[96 + 3] = {0};
  calldata[31] = 1;   /* b_len */
  calldata[63] = 1;   /* e_len */
  calldata[95] = 1;   /* m_len */
  calldata[96] = 8; calldata[97] = 7; calldata[98] = 100;
  byte out[1] = {0};
  int rc = ctt_eth_evm_modexp(out, 1, calldata, sizeof(calldata));
  if (rc != 0 || out[0] != 52) {
    printf("FAIL rc=%d out=%d\n", rc, out[0]);
    return 1;
  }
  printf("modexp C ABI OK (8^7 mod 100 = %d)\n", out[0]);
  return 0;
}
